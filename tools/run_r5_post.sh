#!/bin/bash
# Round-5 post-pretrain orchestrator (VERDICT r4 #1/#2/#4).
#
# Waits for the r5a pretrain leg (runs/pretrain_r4c -> 78k steps) to finish,
# relaunching a resume leg if the deadline box cut it short, then runs:
#   1. main finetune  (finetune_r5,    12k steps, RW=1,1.1,1.3 — the
#      pretrain's own curriculum) + goldens + both held-out r5 eval sets
#   2. RW ablation    (finetune_r5flat 4k steps, RW=1,1,1) + goldens
#   3. RW ablation    (finetune_r5skew 4k steps, RW=1,1.3,1.7) + goldens
# Equal-step / equal-seed ablation legs isolate the radius_weights knob
# (round-4 leg H confounded it with extra steps — VERDICT r4 weak #6).
#
# Launch detached so it survives the builder session:
#   nohup setsid bash tools/run_r5_post.sh > runs/r5_post.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

TARGET=${TARGET:-78000}
stamp() { date "+%F %T"; }

step_now() {
  tail -1 runs/pretrain_r4c/metrics.jsonl 2>/dev/null |
    python3 -c 'import sys,json
try: print(json.loads(sys.stdin.read()).get("step",0))
except Exception: print(0)'
}

log_age_min() {  # minutes since metrics.jsonl last grew
  python3 - <<'EOF'
import os, time
try:
    m = os.path.getmtime("runs/pretrain_r4c/metrics.jsonl")
    print(int((time.time() - m) / 60))
except OSError:
    print(9999)
EOF
}

# ---- stage 0: wait out / finish the pretrain --------------------------------
# Liveness is judged by the r5a campaign PID, NOT log staleness: the inner
# stall-watchdog's own kill+relaunch (pool reload + cold recompile) can
# legitimately stale metrics.jsonl past any short threshold, and launching a
# concurrent retry trainer against the same run dir / chip would be fatal.
# Retry legs launched below run synchronously, so they can't race either.
R5A_PID=${R5A_PID:-13143}
retries=0
while :; do
  s=$(step_now)
  if [ "$s" -ge "$TARGET" ]; then
    echo "[$(stamp)] pretrain at step $s >= $TARGET — done"
    break
  fi
  if [ -d "/proc/$R5A_PID" ]; then
    sleep 120
    continue
  fi
  if [ -f runs/campaign_r5a.DONE ] && [ "$retries" -eq 0 ]; then
    echo "[$(stamp)] r5a DONE at step $s (< $TARGET) — continuing anyway"
    break
  fi
  # original leg dead below target: relaunch a resume box (synchronous)
  retries=$((retries + 1))
  if [ "$retries" -gt 4 ]; then
    echo "[$(stamp)] pretrain stuck at $s after 4 retries — proceeding"
    break
  fi
  echo "[$(stamp)] pretrain leg dead at step $s — retry #$retries"
  PRETRAIN_RUN=pretrain_r4c PRETRAIN_STEPS=$TARGET \
    PRETRAIN_DEADLINE_MIN=75 RW=1,1.1,1.3 NIN=1.2,1,1.6 DENSE2=0.5 \
    bash tools/run_campaign.sh "r5a_retry$retries" pretrain \
    >> runs/campaign_r5a_retries.log 2>&1
done
echo "[$(stamp)] pretrain final step: $(step_now)"

# ---- stage 1: main finetune + full evals ------------------------------------
echo "[$(stamp)] === main finetune leg ==="
FINETUNE_RUN=finetune_r5 FINETUNE_CONFIG=runs/_cfg_finetune_r5.json \
  FINETUNE_STEPS=12000 FINETUNE_DEADLINE_MIN=90 FINETUNE_SEED=47 \
  RW=1,1.1,1.3 NIN=1.2,1,1.6 DENSE2=0.5 \
  bash tools/run_campaign.sh r5m finetune \
    eval:finetune_r5:goldens \
    eval:finetune_r5:data_eval_r5 \
    eval:finetune_r5:data_eval_r5b \
  >> runs/campaign_r5m.log 2>&1
echo "[$(stamp)] main leg rc=$?"

# ---- stage 2+3: equal-step radius_weights ablation --------------------------
echo "[$(stamp)] === ablation: RW=1,1,1 ==="
FINETUNE_RUN=finetune_r5flat FINETUNE_CONFIG=runs/_cfg_finetune_r5.json \
  FINETUNE_STEPS=4000 FINETUNE_DEADLINE_MIN=45 FINETUNE_SEED=47 \
  RW=1,1,1 NIN=1.2,1,1.6 DENSE2=0.5 \
  bash tools/run_campaign.sh r5flat finetune eval:finetune_r5flat:goldens \
  >> runs/campaign_r5flat.log 2>&1
echo "[$(stamp)] flat leg rc=$?"

echo "[$(stamp)] === ablation: RW=1,1.3,1.7 ==="
FINETUNE_RUN=finetune_r5skew FINETUNE_CONFIG=runs/_cfg_finetune_r5.json \
  FINETUNE_STEPS=4000 FINETUNE_DEADLINE_MIN=45 FINETUNE_SEED=47 \
  RW=1,1.3,1.7 NIN=1.2,1,1.6 DENSE2=0.5 \
  bash tools/run_campaign.sh r5skew finetune eval:finetune_r5skew:goldens \
  >> runs/campaign_r5skew.log 2>&1
echo "[$(stamp)] skew leg rc=$?"

echo "[$(stamp)] r5 post pipeline complete"
touch runs/r5_post.DONE
