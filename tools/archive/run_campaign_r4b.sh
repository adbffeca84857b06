#!/bin/bash
# Round-4b campaign: the background-noise leg. Continues the r4 checkpoint
# with --bg_noise 0.5 (far-field colored-noise ambience, the reference's
# n_BG in {0,1} — 6/9 shipped goldens carry noise the model had never
# seen; see datagen.campaign.make_batch) plus voice=mix, then a MultiReso
# finetune, then evals on (a) the r4 held-out sets for comparability,
# (b) new noise-matched sets, (c) the reference goldens.
#
# Step budgets + fast-step env flags are injected at launch:
#   STEPS_PRETRAIN=30000 STEPS_FINETUNE=12000 SB_FLAGS="SB_BLSTM_DIRFUSE=1" \
#     nohup setsid bash tools/run_campaign_r4b.sh > runs/campaign_r4b.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p runs/pool_cache
STEPS_PRETRAIN=${STEPS_PRETRAIN:-30000}
STEPS_FINETUNE=${STEPS_FINETUNE:-12000}
for kv in ${SB_FLAGS:-}; do export "$kv"; done

stamp() { date "+%F %T"; }
echo "[$(stamp)] campaign r4b starting (pretrain $STEPS_PRETRAIN, finetune $STEPS_FINETUNE, flags: ${SB_FLAGS:-none})"

# noise-matched held-out eval sets (host ISM, CPU) — concurrent with stage 1
if [ ! -f data_eval_r4b/.done ]; then
  ( python datasets/make_eval_set.py --out data_eval_r4b --n 60 \
      --duration 2.5 --seed 4321 --voice formant --bg_noise 0.5 \
      && touch data_eval_r4b/.done ) > runs/make_eval_r4b.log 2>&1 &
  echo "[$(stamp)] noise eval-set generation launched (pid $!)"
fi

echo "[$(stamp)] stage 1: pretrain_r4b ($STEPS_PRETRAIN steps, voice=mix, bg_noise 0.5)"
python tools/stall_watchdog.py --log runs/pretrain_r4b/metrics.jsonl \
    --stale-min 6 --grace-min 45 \
    -- python src/train_stream.py --run_dir runs/pretrain_r4b \
       --config runs/_cfg_pretrain_r4b.json --steps "$STEPS_PRETRAIN" \
       --pool 4000 --val_pool 180 --batch "${SB_BATCH:-8}" \
       --clip_seconds 2.5 --voice mix --bg_noise 0.5 --seed 44 \
       --plateau_patience 12 --pool_cache runs/pool_cache --resume \
    >> runs/pretrain_r4b.log 2>&1
rc=$?
echo "[$(stamp)] stage 1 done rc=$rc"
[ $rc -ne 0 ] && { echo "[$(stamp)] ABORT: pretrain failed"; exit $rc; }

echo "[$(stamp)] stage 2: finetune_r4b ($STEPS_FINETUNE steps)"
python tools/stall_watchdog.py --log runs/finetune_r4b/metrics.jsonl \
    --stale-min 6 --grace-min 45 \
    -- python src/train_stream.py --run_dir runs/finetune_r4b \
       --config runs/_cfg_finetune_r4b.json --steps "$STEPS_FINETUNE" \
       --pool 4000 --val_pool 180 --batch "${SB_BATCH:-8}" \
       --clip_seconds 2.5 --voice mix --bg_noise 0.5 --seed 45 \
       --plateau_patience 12 --pool_cache runs/pool_cache --resume \
    >> runs/finetune_r4b.log 2>&1
rc=$?
echo "[$(stamp)] stage 2 done rc=$rc"
[ $rc -ne 0 ] && { echo "[$(stamp)] ABORT: finetune failed"; exit $rc; }

wait  # eval-set generation, if still rendering

for radius in 1m 1_5m 2m; do
  case $radius in
    1m) thr=1.0;; 1_5m) thr=1.5;; 2m) thr=2.0;;
  esac
  for pair in "data_eval_r4:eval_r4b" "data_eval_r4b:eval_r4b_noise"; do
    src_dir=${pair%%:*}; out_tag=${pair##*:}
    echo "[$(stamp)] eval $src_dir syn_${radius}"
    python src/eval_syn.py "$src_dir/syn_${radius}/test" runs/finetune_r4b \
        "runs/${out_tag}/syn_${radius}" --distance_threshold $thr \
        > "runs/${out_tag}_syn_${radius}.log" 2>&1 \
        || echo "eval $out_tag syn_${radius} FAILED"
  done
  echo "[$(stamp)] eval goldens syn_${radius}"
  python src/eval_syn.py /root/reference/test_samples/syn_${radius} \
      runs/finetune_r4b runs/eval_r4b_goldens/syn_${radius} \
      --distance_threshold $thr \
      > runs/eval_r4b_goldens_syn_${radius}.log 2>&1 \
      || echo "eval goldens syn_${radius} FAILED"
done

echo "[$(stamp)] campaign r4b complete"
touch runs/campaign_r4b.DONE
