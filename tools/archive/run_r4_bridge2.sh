#!/bin/bash
# Bridge: wait for the r4d eval loop to finish, re-run the stalled
# eval_r4c_noise/syn_1m eval under the stall watchdog, then launch the
# leg-E campaign (deeper pretrain resume + fresh finetune + 9 evals).
#
#   nohup setsid bash tools/run_r4_bridge2.sh > runs/bridge2.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
stamp() { date "+%F %T"; }

echo "[$(stamp)] waiting for runs/evals_r4d.DONE"
while [ ! -f runs/evals_r4d.DONE ]; do sleep 30; done
echo "[$(stamp)] r4d evals done; re-running eval_r4c_noise syn_1m"

rm -rf runs/eval_r4c_noise/syn_1m
python tools/stall_watchdog.py --log runs/eval_r4c_noise_syn_1m.log \
    --stale-min 6 --grace-min 10 --deadline-min 25 \
    -- python src/eval_syn.py data_eval_r4b/syn_1m/test runs/finetune_r4c \
       runs/eval_r4c_noise/syn_1m --distance_threshold 1.0 \
    > runs/eval_r4c_noise_syn_1m.log 2>&1 \
    || echo "[$(stamp)] noise syn_1m re-run FAILED"
echo "[$(stamp)] noise syn_1m re-run done; launching leg E"

DEADLINE_PRETRAIN_MIN=${DEADLINE_PRETRAIN_MIN:-100} \
DEADLINE_FINETUNE_MIN=${DEADLINE_FINETUNE_MIN:-45} \
  bash tools/run_campaign_r4e.sh
echo "[$(stamp)] bridge2 complete"
