#!/bin/bash
# Round-5 tail sequencer, v2 (supersedes run_r5_tail.sh, whose DONE-file
# trigger was tied to the full r5m campaign; this one preempts the campaign's
# final held-out-set stage so the VERDICT-r4#4 ablation legs fit inside the
# round's wall clock, then runs that stage last if time remains).
#
# Sequence:
#   0. wait for the data_eval_r5 (clean) set's syn_2m eval to finish
#      (eval_r5m_r5_summary.txt written), then kill the r5m campaign tree
#      before/while its data_eval_r5b stage runs
#   1. re-eval reference goldens syn_1m for finetune_r5 (the original box was
#      burned by pytest-contention restarts) + refresh the goldens summary
#   2. ablation leg RW=1,1,1   (4k steps, seed 47, goldens eval)
#   3. ablation leg RW=1,1.3,1.7 (4k steps, seed 47, goldens eval)
#   4. attribution table -> runs/ablation_r5.txt
#   5. if before $R5B_CUTOFF (HH:MM), run the data_eval_r5b radii for the
#      main leg with per-radius boxes
#
# Launch detached:
#   nohup setsid bash tools/run_r5_tail2.sh > runs/r5_tail2.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
stamp() { date "+%F %T"; }
CAMPAIGN_PID=${CAMPAIGN_PID:-30917}
R5B_CUTOFF=${R5B_CUTOFF:-13:20}

kill_tree() {  # kill_tree PID — parent first so nothing relaunches
  local p=$1 kids
  kids=$(ps -o pid= --ppid "$p" 2>/dev/null)
  kill "$p" 2>/dev/null
  for k in $kids; do kill_tree "$k"; done
}

echo "[$(stamp)] waiting for eval_r5m_r5 summary (clean held-out set done)"
while [ ! -f runs/eval_r5m_r5_summary.txt ]; do
  ls /proc/$CAMPAIGN_PID >/dev/null 2>&1 || { echo "[$(stamp)] campaign gone"; break; }
  sleep 60
done
if ls /proc/$CAMPAIGN_PID >/dev/null 2>&1; then
  echo "[$(stamp)] preempting campaign tree (r5b stage deferred)"
  kill_tree "$CAMPAIGN_PID"
  sleep 2
fi

echo "[$(stamp)] === goldens syn_1m re-eval (finetune_r5) ==="
python tools/stall_watchdog.py --log runs/eval_r5m_goldens_syn_1m.log \
    --stale-min 6 --grace-min 8 --deadline-min 25 \
    -- python src/eval_syn.py /root/reference/test_samples/syn_1m \
       runs/finetune_r5 runs/eval_r5m_goldens/syn_1m --distance_threshold 1.0 \
    >> runs/eval_r5m_goldens_syn_1m.log 2>&1
JAX_PLATFORMS=cpu python tools/summarize_eval.py runs/eval_r5m_goldens \
    > runs/eval_r5m_goldens_summary.txt 2>&1

echo "[$(stamp)] === ablation: RW=1,1,1 ==="
FINETUNE_RUN=finetune_r5flat FINETUNE_CONFIG=runs/_cfg_finetune_r5.json \
  FINETUNE_STEPS=4000 FINETUNE_DEADLINE_MIN=40 FINETUNE_SEED=47 \
  RW=1,1,1 NIN=1.2,1,1.6 DENSE2=0.5 \
  bash tools/run_campaign.sh r5flat finetune eval:finetune_r5flat:goldens \
  >> runs/campaign_r5flat.log 2>&1
echo "[$(stamp)] flat leg rc=$?"

echo "[$(stamp)] === ablation: RW=1,1.3,1.7 ==="
FINETUNE_RUN=finetune_r5skew FINETUNE_CONFIG=runs/_cfg_finetune_r5.json \
  FINETUNE_STEPS=4000 FINETUNE_DEADLINE_MIN=40 FINETUNE_SEED=47 \
  RW=1,1.3,1.7 NIN=1.2,1,1.6 DENSE2=0.5 \
  bash tools/run_campaign.sh r5skew finetune eval:finetune_r5skew:goldens \
  >> runs/campaign_r5skew.log 2>&1
echo "[$(stamp)] skew leg rc=$?"

JAX_PLATFORMS=cpu python tools/ablation_table.py \
    main=runs/eval_r5m_goldens flat=runs/eval_r5flat_goldens \
    skew=runs/eval_r5skew_goldens \
    > runs/ablation_r5.txt 2>&1 || true
echo "[$(stamp)] ablation table written"

now=$(date +%H:%M)
if [[ "$now" < "$R5B_CUTOFF" ]]; then
  echo "[$(stamp)] === deferred data_eval_r5b evals (cutoff $R5B_CUTOFF) ==="
  for radius in 1m 1_5m 2m; do
    case $radius in 1m) thr=1.0;; 1_5m) thr=1.5;; 2m) thr=2.0;; esac
    [[ "$(date +%H:%M)" < "$R5B_CUTOFF" ]] || { echo "[$(stamp)] cutoff hit"; break; }
    python tools/stall_watchdog.py --log runs/eval_r5m_r5b_syn_${radius}.log \
        --stale-min 6 --grace-min 8 --deadline-min 20 \
        -- python src/eval_syn.py data_eval_r5b/syn_${radius}/test \
           runs/finetune_r5 runs/eval_r5m_r5b/syn_${radius} \
           --distance_threshold $thr \
        >> runs/eval_r5m_r5b_syn_${radius}.log 2>&1 \
        || echo "[$(stamp)] r5b syn_${radius} FAILED"
  done
  JAX_PLATFORMS=cpu python tools/summarize_eval.py runs/eval_r5m_r5b \
      > runs/eval_r5m_r5b_summary.txt 2>&1
fi
echo "[$(stamp)] r5 tail2 complete"
touch runs/r5_post.DONE
