#!/bin/bash
# Leg-E tail: adopted stage 2 + evals after the original run_campaign_r4e.sh
# driver was killed (its bare eval loop lacked stall watchdogs; this tail
# adds them). Waits for the ALREADY-RUNNING stage-1 watchdog (pid $1) to
# exit, then runs the finetune and the 9 watchdogged evals.
#
#   nohup setsid bash tools/run_r4e_tail.sh <stage1_watchdog_pid> \
#     > runs/r4e_tail.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
STEPS_FINETUNE=${STEPS_FINETUNE:-25000}
DEADLINE_FINETUNE_MIN=${DEADLINE_FINETUNE_MIN:-90}
stamp() { date "+%F %T"; }

WD_PID=${1:?stage-1 watchdog pid required}
echo "[$(stamp)] waiting for stage-1 watchdog pid $WD_PID"
while kill -0 "$WD_PID" 2>/dev/null; do sleep 30; done
echo "[$(stamp)] stage 1 finished; starting finetune_r4e (deadline ${DEADLINE_FINETUNE_MIN} min)"

python tools/stall_watchdog.py --log runs/finetune_r4e/metrics.jsonl \
    --stale-min 6 --grace-min 45 --deadline-min "$DEADLINE_FINETUNE_MIN" \
    -- python src/train_stream.py --run_dir runs/finetune_r4e \
       --config runs/_cfg_finetune_r4e.json --steps "$STEPS_FINETUNE" \
       --pool 4000 --val_pool 180 --batch 8 --pool_bf16 \
       --clip_seconds 2.5 --voice mix --bg_noise 0.5 --seed 48 \
       --plateau_patience 12 --pool_cache runs/pool_cache --resume \
    >> runs/finetune_r4e.log 2>&1
rc=$?
echo "[$(stamp)] stage 2 done rc=$rc"
[ $rc -ne 0 ] && { echo "[$(stamp)] ABORT: finetune failed"; exit $rc; }

for radius in 1m 1_5m 2m; do
  case $radius in
    1m) thr=1.0;; 1_5m) thr=1.5;; 2m) thr=2.0;;
  esac
  for pair in "data_eval_r4:eval_r4e" "data_eval_r4b:eval_r4e_noise"; do
    src_dir=${pair%%:*}; out_tag=${pair##*:}
    echo "[$(stamp)] eval $src_dir syn_${radius}"
    python tools/stall_watchdog.py --log "runs/${out_tag}_syn_${radius}.log" \
        --stale-min 6 --grace-min 10 --deadline-min 25 \
        -- python src/eval_syn.py "$src_dir/syn_${radius}/test" \
           runs/finetune_r4e "runs/${out_tag}/syn_${radius}" \
           --distance_threshold $thr \
        > "runs/${out_tag}_syn_${radius}.log" 2>&1 \
        || echo "eval $out_tag syn_${radius} FAILED"
  done
  echo "[$(stamp)] eval goldens syn_${radius}"
  python tools/stall_watchdog.py --log "runs/eval_r4e_goldens_syn_${radius}.log" \
      --stale-min 6 --grace-min 10 --deadline-min 25 \
      -- python src/eval_syn.py /root/reference/test_samples/syn_${radius} \
         runs/finetune_r4e runs/eval_r4e_goldens/syn_${radius} \
         --distance_threshold $thr \
      > runs/eval_r4e_goldens_syn_${radius}.log 2>&1 \
      || echo "eval goldens syn_${radius} FAILED"
done
echo "[$(stamp)] leg E tail complete"
touch runs/campaign_r4e.DONE
