#!/bin/bash
# Session-3 time-boxed campaign leg: continued SNRLP pretrain from the
# round-3 checkpoint with voice=mix + bg_noise 0.5 (merges the staged r4
# mixed-source leg and the r4b background-noise leg into one leg sized to
# the session's wall clock), then evals on the reference goldens and the
# noise-matched held-out set.
#   STEPS=6000 SB_FLAGS="SB_LSTM_CHUNK=6 SB_BLSTM_DIRFUSE=1" \
#     nohup setsid bash tools/run_campaign_s3.sh > runs/campaign_s3.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p runs/pool_cache
STEPS=${STEPS:-6000}
for kv in ${SB_FLAGS:-}; do export "$kv"; done

stamp() { date "+%F %T"; }
echo "[$(stamp)] campaign s3: continued pretrain ($STEPS steps, voice=mix, bg_noise 0.5, flags: ${SB_FLAGS:-none})"

python tools/stall_watchdog.py --log runs/pretrain_s3/metrics.jsonl \
    --stale-min 6 --grace-min 20 \
    -- python src/train_stream.py --run_dir runs/pretrain_s3 \
       --config runs/_cfg_pretrain_s3.json --steps "$STEPS" \
       --pool 2000 --val_pool 180 --batch "${SB_BATCH:-8}" \
       --clip_seconds 2.5 --voice mix --bg_noise 0.5 --seed 44 \
       --plateau_patience 12 --pool_cache runs/pool_cache --resume \
    >> runs/pretrain_s3.log 2>&1
rc=$?
echo "[$(stamp)] pretrain done rc=$rc"
[ $rc -ne 0 ] && { echo "[$(stamp)] ABORT: pretrain failed"; exit $rc; }

for radius in 1m 1_5m 2m; do
  case $radius in
    1m) thr=1.0;; 1_5m) thr=1.5;; 2m) thr=2.0;;
  esac
  echo "[$(stamp)] eval goldens syn_${radius}"
  python src/eval_syn.py /root/reference/test_samples/syn_${radius} \
      runs/pretrain_s3 runs/eval_s3_goldens/syn_${radius} \
      --distance_threshold $thr \
      > runs/eval_s3_goldens_syn_${radius}.log 2>&1 \
      || echo "eval goldens syn_${radius} FAILED"
  if [ -f data_eval_s3/.done ]; then
    echo "[$(stamp)] eval noise-matched syn_${radius}"
    python src/eval_syn.py "data_eval_s3/syn_${radius}/test" runs/pretrain_s3 \
        "runs/eval_s3_noise/syn_${radius}" --distance_threshold $thr \
        > runs/eval_s3_noise_syn_${radius}.log 2>&1 \
        || echo "eval noise syn_${radius} FAILED"
  fi
done

echo "[$(stamp)] campaign s3 complete"
touch runs/campaign_s3.DONE
