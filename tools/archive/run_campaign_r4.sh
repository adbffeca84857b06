#!/bin/bash
# Round-4 two-stage campaign (see QUALITY.md): continued pretrain from the
# round-3 checkpoint with voice=mix (widest in-image source distribution —
# targets the goldens over-suppression found in round 3), then a MultiReso
# finetune, then held-out + reference-goldens evals. Every stage runs under
# the stall watchdog (CLAUDE.md: the TPU tunnel can hang an RPC forever).
#
#   nohup setsid bash tools/run_campaign_r4.sh > runs/campaign_r4.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p runs/pool_cache

stamp() { date "+%F %T"; }
echo "[$(stamp)] campaign r4 starting"

# Held-out eval sets (host ISM, CPU-only) — build concurrently with stage 1.
# Same protocol as round 3 (formant voices, seed 1234) for comparability.
if [ ! -f data_eval_r4/.done ]; then
  ( python datasets/make_eval_set.py --out data_eval_r4 --n 60 \
      --duration 2.5 --seed 1234 --voice formant \
      && touch data_eval_r4/.done ) > runs/make_eval_r4.log 2>&1 &
  EVAL_GEN_PID=$!
  echo "[$(stamp)] eval-set generation launched (pid $EVAL_GEN_PID)"
else
  EVAL_GEN_PID=""
fi

# Stage 1: continued SNRLP pretrain, voice=mix, fresh room pool (seed 42).
echo "[$(stamp)] stage 1: pretrain_r4 (60k steps, voice=mix)"
python tools/stall_watchdog.py --log runs/pretrain_r4/metrics.jsonl \
    --stale-min 6 --grace-min 45 \
    -- python src/train_stream.py --run_dir runs/pretrain_r4 \
       --config runs/_cfg_pretrain_r4.json --steps 60000 --pool 4000 \
       --val_pool 180 --batch 8 --clip_seconds 2.5 --voice mix --seed 42 \
       --pool_cache runs/pool_cache --resume \
    >> runs/pretrain_r4.log 2>&1
rc=$?
echo "[$(stamp)] stage 1 done rc=$rc"
[ $rc -ne 0 ] && { echo "[$(stamp)] ABORT: pretrain failed"; exit $rc; }

# Stage 2: MultiResoFuseLoss finetune from the stage-1 last checkpoint.
echo "[$(stamp)] stage 2: finetune_r4 (12k steps)"
python tools/stall_watchdog.py --log runs/finetune_r4/metrics.jsonl \
    --stale-min 6 --grace-min 45 \
    -- python src/train_stream.py --run_dir runs/finetune_r4 \
       --config runs/_cfg_finetune_r4.json --steps 12000 --pool 4000 \
       --val_pool 180 --batch 8 --clip_seconds 2.5 --voice mix --seed 43 \
       --pool_cache runs/pool_cache --resume \
    >> runs/finetune_r4.log 2>&1
rc=$?
echo "[$(stamp)] stage 2 done rc=$rc"
[ $rc -ne 0 ] && { echo "[$(stamp)] ABORT: finetune failed"; exit $rc; }

# Wait for the eval sets if still rendering.
if [ -n "${EVAL_GEN_PID}" ]; then
  echo "[$(stamp)] waiting for eval-set generation"
  wait "$EVAL_GEN_PID" || true
fi

# Evals: held-out sets + the reference's shipped goldens, stock CLI.
for radius in 1m 1_5m 2m; do
  case $radius in
    1m) thr=1.0;; 1_5m) thr=1.5;; 2m) thr=2.0;;
  esac
  echo "[$(stamp)] eval held-out syn_${radius}"
  python src/eval_syn.py data_eval_r4/syn_${radius}/test runs/finetune_r4 \
      runs/eval_r4/syn_${radius} --distance_threshold $thr \
      > runs/eval_r4_syn_${radius}.log 2>&1 || echo "eval syn_${radius} FAILED"
  echo "[$(stamp)] eval goldens syn_${radius}"
  python src/eval_syn.py /root/reference/test_samples/syn_${radius} \
      runs/finetune_r4 runs/eval_r4_goldens/syn_${radius} \
      --distance_threshold $thr \
      > runs/eval_r4_goldens_syn_${radius}.log 2>&1 \
      || echo "eval goldens syn_${radius} FAILED"
done

echo "[$(stamp)] campaign r4 complete"
touch runs/campaign_r4.DONE
