#!/bin/bash
# Round-4 leg H: radius-weighted finetune, sized to the session-4 tail.
#
# Leg G's post-mortem (runs/campaign_r4g.log): the VM restart wiped
# runs/pool_cache, and on this 1-CPU host the 4000-scenario pool rebuild
# (~15 min) ate both 20/15-min deadline boxes before a single step ran.
# Leg H pre-generates a smaller 1500-scenario pool out-of-band
# (tools/pregen_pool.py) and spends the whole box on steps: resumes from
# finetune_r4c's BEST checkpoint (the round's flagship) with the 1.5/2.0 m
# classes oversampled (--radius_weights 1,1.3,1.7), then re-runs the three
# goldens evals — the decisive table for VERDICT r3 #2.
#
#   DEADLINE_FINETUNE_MIN=10 nohup setsid bash tools/run_campaign_r4h.sh \
#     > runs/campaign_r4h.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
STEPS_FINETUNE=${STEPS_FINETUNE:-25000}
DEADLINE_FINETUNE_MIN=${DEADLINE_FINETUNE_MIN:-10}
RW=${RW:-1,1.3,1.7}
stamp() { date "+%F %T"; }

# wait (bounded) for the pre-generated pool so the box isn't spent on datagen
for i in $(seq 1 60); do
  [ -f runs/pool_cache/bgtrain_1500_49.npz ] && break
  sleep 10
done
[ -f runs/pool_cache/bgtrain_1500_49.npz ] || echo "[$(stamp)] WARN: pool not pre-cached; trainer will build it in-box"

echo "[$(stamp)] leg H: finetune_r4h from finetune_r4c/best, radius_weights $RW (deadline ${DEADLINE_FINETUNE_MIN} min)"
python tools/stall_watchdog.py --log runs/finetune_r4h/metrics.jsonl \
    --stale-min 6 --grace-min 8 --deadline-min "$DEADLINE_FINETUNE_MIN" \
    -- python src/train_stream.py --run_dir runs/finetune_r4h \
       --config runs/_cfg_finetune_r4g.json --steps "$STEPS_FINETUNE" \
       --pool 1500 --val_pool 180 --batch 8 --pool_bf16 \
       --clip_seconds 2.5 --voice mix --bg_noise 0.5 --seed 49 \
       --radius_weights "$RW" \
       --plateau_patience 12 --pool_cache runs/pool_cache --resume \
    >> runs/finetune_r4h.log 2>&1
rc=$?
echo "[$(stamp)] finetune done rc=$rc"
[ $rc -ne 0 ] && { echo "[$(stamp)] ABORT: finetune failed"; exit $rc; }

for radius in 1m 1_5m 2m; do
  case $radius in
    1m) thr=1.0;; 1_5m) thr=1.5;; 2m) thr=2.0;;
  esac
  echo "[$(stamp)] eval goldens syn_${radius}"
  python tools/stall_watchdog.py --log "runs/eval_r4h_goldens_syn_${radius}.log" \
      --stale-min 6 --grace-min 6 --deadline-min 10 \
      -- python src/eval_syn.py /root/reference/test_samples/syn_${radius} \
         runs/finetune_r4h runs/eval_r4h_goldens/syn_${radius} \
         --distance_threshold $thr \
      > runs/eval_r4h_goldens_syn_${radius}.log 2>&1 \
      || echo "eval goldens syn_${radius} FAILED"
done
JAX_PLATFORMS=cpu python tools/summarize_eval.py runs/eval_r4h_goldens \
    > runs/eval_r4h_goldens_summary.txt 2>&1
echo "[$(stamp)] leg H complete"
touch runs/campaign_r4h.DONE
