#!/bin/bash
# Round-4 leg F: depth + radius re-weighting.
#
# Resumes runs/pretrain_r4c for another deadline box with the 1.5/2.0 m
# classes oversampled (--radius_weights 1,1.3,1.7 — the r4c evals put the
# 2.0 m regime last to converge), re-finetunes from the deeper checkpoint
# with the same weighting into a FRESH run dir (runs/finetune_r4f), then
# re-runs the 9 campaign evals into runs/eval_r4f* so legs C/E stay
# intact for the depth comparison.
#
#   DEADLINE_PRETRAIN_MIN=90 DEADLINE_FINETUNE_MIN=90 \
#     nohup setsid bash tools/run_campaign_r4f.sh > runs/campaign_r4f.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
STEPS_PRETRAIN=${STEPS_PRETRAIN:-78000}
STEPS_FINETUNE=${STEPS_FINETUNE:-25000}
DEADLINE_PRETRAIN_MIN=${DEADLINE_PRETRAIN_MIN:-90}
DEADLINE_FINETUNE_MIN=${DEADLINE_FINETUNE_MIN:-90}
RW=${RW:-1,1.3,1.7}
stamp() { date "+%F %T"; }

echo "[$(stamp)] leg F stage 1: pretrain_r4c resume, radius_weights $RW (deadline ${DEADLINE_PRETRAIN_MIN} min)"
python tools/stall_watchdog.py --log runs/pretrain_r4c/metrics.jsonl \
    --stale-min 6 --grace-min 45 --deadline-min "$DEADLINE_PRETRAIN_MIN" \
    -- python src/train_stream.py --run_dir runs/pretrain_r4c \
       --config runs/_cfg_pretrain_r4c.json --steps "$STEPS_PRETRAIN" \
       --pool 4000 --val_pool 180 --batch 8 --pool_bf16 \
       --clip_seconds 2.5 --voice mix --bg_noise 0.5 --seed 46 \
       --radius_weights "$RW" \
       --plateau_patience 12 --pool_cache runs/pool_cache --resume \
    >> runs/pretrain_r4c.log 2>&1
rc=$?
echo "[$(stamp)] stage 1 done rc=$rc"
[ $rc -ne 0 ] && { echo "[$(stamp)] ABORT: pretrain failed"; exit $rc; }

echo "[$(stamp)] leg F stage 2: finetune_r4f, radius_weights $RW (deadline ${DEADLINE_FINETUNE_MIN} min)"
python tools/stall_watchdog.py --log runs/finetune_r4f/metrics.jsonl \
    --stale-min 6 --grace-min 45 --deadline-min "$DEADLINE_FINETUNE_MIN" \
    -- python src/train_stream.py --run_dir runs/finetune_r4f \
       --config runs/_cfg_finetune_r4e.json --steps "$STEPS_FINETUNE" \
       --pool 4000 --val_pool 180 --batch 8 --pool_bf16 \
       --clip_seconds 2.5 --voice mix --bg_noise 0.5 --seed 49 \
       --radius_weights "$RW" \
       --plateau_patience 12 --pool_cache runs/pool_cache --resume \
    >> runs/finetune_r4f.log 2>&1
rc=$?
echo "[$(stamp)] stage 2 done rc=$rc"
[ $rc -ne 0 ] && { echo "[$(stamp)] ABORT: finetune failed"; exit $rc; }

for radius in 1m 1_5m 2m; do
  case $radius in
    1m) thr=1.0;; 1_5m) thr=1.5;; 2m) thr=2.0;;
  esac
  for pair in "data_eval_r4:eval_r4f" "data_eval_r4b:eval_r4f_noise"; do
    src_dir=${pair%%:*}; out_tag=${pair##*:}
    echo "[$(stamp)] eval $src_dir syn_${radius}"
    python tools/stall_watchdog.py --log "runs/${out_tag}_syn_${radius}.log" \
        --stale-min 6 --grace-min 10 --deadline-min 25 \
        -- python src/eval_syn.py "$src_dir/syn_${radius}/test" \
           runs/finetune_r4f "runs/${out_tag}/syn_${radius}" \
           --distance_threshold $thr \
        > "runs/${out_tag}_syn_${radius}.log" 2>&1 \
        || echo "eval $out_tag syn_${radius} FAILED"
  done
  echo "[$(stamp)] eval goldens syn_${radius}"
  python tools/stall_watchdog.py --log "runs/eval_r4f_goldens_syn_${radius}.log" \
      --stale-min 6 --grace-min 10 --deadline-min 25 \
      -- python src/eval_syn.py /root/reference/test_samples/syn_${radius} \
         runs/finetune_r4f runs/eval_r4f_goldens/syn_${radius} \
         --distance_threshold $thr \
      > runs/eval_r4f_goldens_syn_${radius}.log 2>&1 \
      || echo "eval goldens syn_${radius} FAILED"
done
echo "[$(stamp)] leg F complete"
touch runs/campaign_r4f.DONE
