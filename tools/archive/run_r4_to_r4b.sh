#!/bin/bash
# Bridge: when campaign r4 finishes, run the train-step sweep (TODO.md:
# dirfuse x chunk x batch) on the freed chip, pick the fastest batch-8
# config, and launch campaign r4b with those flags. Detached usage:
#   nohup setsid bash tools/run_r4_to_r4b.sh > runs/bridge_r4b.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

stamp() { date "+%F %T"; }
echo "[$(stamp)] bridge: waiting for runs/campaign_r4.DONE"
while [ ! -f runs/campaign_r4.DONE ]; do sleep 60; done
echo "[$(stamp)] campaign r4 done — starting sweep"

# Sweep (resumable: skip if the full grid already ran). Each invocation is
# one cell so a tunnel stall only costs that cell (timeout + 1 retry).
mkdir -p runs
sweep_cell() {  # batch chunk dirfuse
  local b=$1 k=$2 df=$3
  if grep -q "\"batch\": $b, \"chunk\": $k, \"chunk_bwd\": $k, \"dirfuse\": $([ "$df" = 1 ] && echo true || echo false)" \
      runs/sweep_r4.jsonl 2>/dev/null; then
    echo "[$(stamp)] cell b=$b k=$k df=$df cached"
    return
  fi
  echo "[$(stamp)] cell b=$b k=$k df=$df"
  for attempt in 1 2; do
    timeout 1200 python tools/train_sweep.py --batches "$b" --chunks "$k" \
        --dirfuse "$df" --steps 6 >> runs/sweep_r4.jsonl 2>runs/sweep_r4.err \
      && return
    echo "[$(stamp)] cell b=$b k=$k df=$df attempt $attempt failed (rc=$?)"
  done
}
for df in 0 1; do
  for k in 6 8; do
    for b in 8 12; do
      sweep_cell "$b" "$k" "$df"
    done
  done
done
echo "[$(stamp)] sweep done:"
cat runs/sweep_r4.jsonl

# Winner at batch 8 (the campaign recipe's batch — optimization dynamics
# stay comparable with r4); flags feed the r4b trainer env.
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
                best = (d["chunk"], 1 if d["dirfuse"] else 0, d["ingest_x_rt"])
except FileNotFoundError:
    pass
print(best[0], best[1])
EOF
)
echo "[$(stamp)] winner at batch 8: chunk=$WIN_CHUNK dirfuse=$WIN_DF"

export STEPS_PRETRAIN=${STEPS_PRETRAIN:-30000}
export STEPS_FINETUNE=${STEPS_FINETUNE:-12000}
export SB_FLAGS="SB_LSTM_CHUNK=$WIN_CHUNK SB_BLSTM_DIRFUSE=$WIN_DF"
echo "[$(stamp)] launching campaign r4b (SB_FLAGS=$SB_FLAGS)"
bash tools/run_campaign_r4b.sh > runs/campaign_r4b.log 2>&1
echo "[$(stamp)] bridge complete"
