#!/bin/bash
# Round-4 FROM-SCRATCH campaign (VERDICT r3 #2): pretrain with the full
# source distribution from step 0 — voice=mix (75% Klatt-formant + 25%
# broadband quasi-speech) AND --bg_noise 0.5 (far-field colored-noise
# ambience; the reference's n_BG in {0,1}, 6/9 shipped goldens carry it) —
# instead of round 3's end-of-budget exposure patch. Then a MultiReso
# finetune, then evals on the r4 held-out sets, noise-matched sets, and the
# reference goldens. Every stage runs under the stall watchdog (CLAUDE.md:
# the TPU tunnel can hang an RPC forever).
#
#   STEPS_PRETRAIN=100000 STEPS_FINETUNE=25000 \
#     nohup setsid bash tools/run_campaign_r4c.sh > runs/campaign_r4c.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p runs/pool_cache
STEPS_PRETRAIN=${STEPS_PRETRAIN:-100000}
STEPS_FINETUNE=${STEPS_FINETUNE:-25000}
for kv in ${SB_FLAGS:-}; do export "$kv"; done

stamp() { date "+%F %T"; }
echo "[$(stamp)] campaign r4c starting (pretrain $STEPS_PRETRAIN, finetune $STEPS_FINETUNE, flags: ${SB_FLAGS:-none})"

# held-out eval sets (host ISM, CPU) — concurrent with stage 1; reuse the
# r4/r4b sets if they already rendered (same seeds/protocol as round 3)
if [ ! -f data_eval_r4/.done ]; then
  ( python datasets/make_eval_set.py --out data_eval_r4 --n 60 \
      --duration 2.5 --seed 1234 --voice formant \
      && touch data_eval_r4/.done ) > runs/make_eval_r4.log 2>&1 &
  echo "[$(stamp)] held-out eval-set generation launched (pid $!)"
fi
if [ ! -f data_eval_r4b/.done ]; then
  ( python datasets/make_eval_set.py --out data_eval_r4b --n 60 \
      --duration 2.5 --seed 4321 --voice formant --bg_noise 0.5 \
      && touch data_eval_r4b/.done ) > runs/make_eval_r4b.log 2>&1 &
  echo "[$(stamp)] noise eval-set generation launched (pid $!)"
fi

echo "[$(stamp)] stage 1: pretrain_r4c ($STEPS_PRETRAIN steps, voice=mix, bg_noise 0.5, from scratch)"
python tools/stall_watchdog.py --log runs/pretrain_r4c/metrics.jsonl \
    --stale-min 6 --grace-min 45 \
    -- python src/train_stream.py --run_dir runs/pretrain_r4c \
       --config runs/_cfg_pretrain_r4c.json --steps "$STEPS_PRETRAIN" \
       --pool 4000 --val_pool 180 --batch "${SB_BATCH:-8}" --pool_bf16 \
       --clip_seconds 2.5 --voice mix --bg_noise 0.5 --seed 46 \
       --plateau_patience 12 --pool_cache runs/pool_cache --resume \
    >> runs/pretrain_r4c.log 2>&1
rc=$?
echo "[$(stamp)] stage 1 done rc=$rc"
[ $rc -ne 0 ] && { echo "[$(stamp)] ABORT: pretrain failed"; exit $rc; }

echo "[$(stamp)] stage 2: finetune_r4c ($STEPS_FINETUNE steps)"
python tools/stall_watchdog.py --log runs/finetune_r4c/metrics.jsonl \
    --stale-min 6 --grace-min 45 \
    -- python src/train_stream.py --run_dir runs/finetune_r4c \
       --config runs/_cfg_finetune_r4c.json --steps "$STEPS_FINETUNE" \
       --pool 4000 --val_pool 180 --batch "${SB_BATCH:-8}" --pool_bf16 \
       --clip_seconds 2.5 --voice mix --bg_noise 0.5 --seed 47 \
       --plateau_patience 12 --pool_cache runs/pool_cache --resume \
    >> runs/finetune_r4c.log 2>&1
rc=$?
echo "[$(stamp)] stage 2 done rc=$rc"
[ $rc -ne 0 ] && { echo "[$(stamp)] ABORT: finetune failed"; exit $rc; }

wait  # eval-set generation, if still rendering

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

echo "[$(stamp)] campaign r4c complete"
touch runs/campaign_r4c.DONE
