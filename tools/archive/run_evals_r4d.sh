#!/bin/bash
# Post-finetune eval stage of campaign r4d, detached from the (killed)
# campaign script. Waits for the finetune trainer to exit, then runs the
# same 9 evals run_campaign_r4d.sh would have.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
stamp() { date "+%F %T"; }
TRAINER_PID=${1:-}
if [ -n "$TRAINER_PID" ]; then
  echo "[$(stamp)] waiting for trainer pid $TRAINER_PID"
  while kill -0 "$TRAINER_PID" 2>/dev/null; do sleep 20; done
  echo "[$(stamp)] trainer exited"
fi
for radius in 1m 1_5m 2m; do
  case $radius in
    1m) thr=1.0;; 1_5m) thr=1.5;; 2m) thr=2.0;;
  esac
  for pair in "data_eval_r4:eval_r4c" "data_eval_r4b:eval_r4c_noise"; do
    src_dir=${pair%%:*}; out_tag=${pair##*:}
    echo "[$(stamp)] eval $src_dir syn_${radius}"
    python src/eval_syn.py "$src_dir/syn_${radius}/test" runs/finetune_r4c \
        "runs/${out_tag}/syn_${radius}" --distance_threshold $thr \
        > "runs/${out_tag}_syn_${radius}.log" 2>&1 \
        || echo "eval $out_tag syn_${radius} FAILED"
  done
  echo "[$(stamp)] eval goldens syn_${radius}"
  python src/eval_syn.py /root/reference/test_samples/syn_${radius} \
      runs/finetune_r4c runs/eval_r4c_goldens/syn_${radius} \
      --distance_threshold $thr \
      > runs/eval_r4c_goldens_syn_${radius}.log 2>&1 \
      || echo "eval goldens syn_${radius} FAILED"
done
echo "[$(stamp)] evals complete"
touch runs/evals_r4d.DONE
