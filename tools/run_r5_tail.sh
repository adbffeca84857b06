#!/bin/bash
# Round-5 tail orchestrator: the two equal-step radius_weights ablation legs
# (VERDICT r4 #4) + the attribution table.
#
# Replaces stages 2+3 of tools/run_r5_post.sh after the pretrain leg was
# deliberately cut at step 71.5k (val plateaued at ~5.03 SI-SDRi for 6k steps
# with lr at the 1e-6 floor — see runs/pretrain_r4c/metrics.jsonl), which
# handed the orchestrator's stage-1 finetune the chip 40 min early; the
# original post orchestrator was stopped in that window, so the ablation
# stages live here and key off campaign_r5m.DONE.
#
# Launch detached:
#   nohup setsid bash tools/run_r5_tail.sh > runs/r5_tail.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
stamp() { date "+%F %T"; }

echo "[$(stamp)] waiting for campaign_r5m.DONE (main finetune + 3 eval sets)"
while [ ! -f runs/campaign_r5m.DONE ]; do
  # if the r5m campaign dies without DONE, proceed anyway once its tree is gone
  if ! ls /proc/30917 >/dev/null 2>&1; then
    echo "[$(stamp)] r5m campaign PID gone without DONE — proceeding"
    break
  fi
  sleep 120
done
echo "[$(stamp)] === ablation: RW=1,1,1 ==="
FINETUNE_RUN=finetune_r5flat FINETUNE_CONFIG=runs/_cfg_finetune_r5.json \
  FINETUNE_STEPS=4000 FINETUNE_DEADLINE_MIN=45 FINETUNE_SEED=47 \
  RW=1,1,1 NIN=1.2,1,1.6 DENSE2=0.5 \
  bash tools/run_campaign.sh r5flat finetune eval:finetune_r5flat:goldens \
  >> runs/campaign_r5flat.log 2>&1
echo "[$(stamp)] flat leg rc=$?"

echo "[$(stamp)] === ablation: RW=1,1.3,1.7 ==="
FINETUNE_RUN=finetune_r5skew FINETUNE_CONFIG=runs/_cfg_finetune_r5.json \
  FINETUNE_STEPS=4000 FINETUNE_DEADLINE_MIN=45 FINETUNE_SEED=47 \
  RW=1,1.3,1.7 NIN=1.2,1,1.6 DENSE2=0.5 \
  bash tools/run_campaign.sh r5skew finetune eval:finetune_r5skew:goldens \
  >> runs/campaign_r5skew.log 2>&1
echo "[$(stamp)] skew leg rc=$?"

JAX_PLATFORMS=cpu python tools/ablation_table.py \
    main=runs/eval_r5m_goldens flat=runs/eval_r5flat_goldens \
    skew=runs/eval_r5skew_goldens \
    > runs/ablation_r5.txt 2>&1 || true
echo "[$(stamp)] r5 tail complete"
touch runs/r5_post.DONE
