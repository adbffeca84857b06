#!/bin/bash
# Session-3 TPU orchestrator: train-step sweep (already running) -> pick
# the fastest batch-8 flags -> campaign r4 (60k pretrain + 12k finetune +
# evals, tools/run_campaign_r4.sh) -> campaign r4b (bg-noise leg,
# tools/run_campaign_r4b.sh). Replaces tools/run_r4_to_r4b.sh's order (the
# chip was free at session start, so the sweep ran FIRST and r4 gets the
# winning flags too).
#   nohup setsid bash tools/run_session3.sh > runs/session3.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
stamp() { date "+%F %T"; }

echo "[$(stamp)] waiting for the sweep to finish"
while ! grep -q "sweep done" runs/sweep_r4_driver.log 2>/dev/null; do
  sleep 30
done
echo "[$(stamp)] sweep done:"
cat runs/sweep_r4.jsonl

read -r WIN_CHUNK WIN_DF < <(python - <<'EOF'
import json
best = (6, 0, 0.0)
try:
    for line in open("runs/sweep_r4.jsonl"):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("what") == "train" and d.get("batch") == 8:
            if d["ingest_x_rt"] > best[2]:
                best = (d["chunk"], 1 if d["dirfuse"] else 0,
                        d["ingest_x_rt"])
except FileNotFoundError:
    pass
print(best[0], best[1])
EOF
)
echo "[$(stamp)] winner at batch 8: chunk=$WIN_CHUNK dirfuse=$WIN_DF"
export SB_LSTM_CHUNK=$WIN_CHUNK
export SB_LSTM_CHUNK_BWD=$WIN_CHUNK
export SB_BLSTM_DIRFUSE=$WIN_DF
export SB_FLAGS="SB_LSTM_CHUNK=$WIN_CHUNK SB_LSTM_CHUNK_BWD=$WIN_CHUNK SB_BLSTM_DIRFUSE=$WIN_DF"

if [ ! -f runs/campaign_r4.DONE ]; then
  echo "[$(stamp)] launching campaign r4 (flags: $SB_FLAGS)"
  bash tools/run_campaign_r4.sh > runs/campaign_r4.log 2>&1
  echo "[$(stamp)] campaign r4 rc=$?"
fi
[ -f runs/campaign_r4.DONE ] || { echo "[$(stamp)] r4 did not finish — stopping"; exit 1; }

echo "[$(stamp)] launching campaign r4b (flags: $SB_FLAGS)"
STEPS_PRETRAIN=${STEPS_PRETRAIN:-30000} STEPS_FINETUNE=${STEPS_FINETUNE:-12000} \
  bash tools/run_campaign_r4b.sh > runs/campaign_r4b.log 2>&1
echo "[$(stamp)] campaign r4b rc=$?"
echo "[$(stamp)] session3 orchestration complete"
