#!/bin/bash
# Unified campaign driver (VERDICT r4 #5: replaces the eight near-copy
# run_campaign_r4*.sh legs — those are archived in tools/archive/).
#
# One leg = an ordered list of stages, each watchdogged and deadline-boxed:
#
#   bash tools/run_campaign.sh LEG STAGE [STAGE...]
#
# Stages:
#   pretrain            train/extend runs/$PRETRAIN_RUN (SNRLP stage)
#   finetune            train/extend runs/finetune_$LEG (perceptual stage)
#   eval:RUN:SET        eval checkpoint runs/RUN over SET, where SET is
#                       `goldens` (/root/reference/test_samples) or a
#                       held-out dir like data_eval_r4 (expects
#                       SET/syn_{1m,1_5m,2m}/test); results land in
#                       runs/eval_${LEG}_${SET#data_eval_}/
#
# HARD PRECONDITION (the leg-G failure class): every training stage passes
# --require_pool_cache, and this driver additionally verifies the npz files
# exist BEFORE launching anything, so a deadline box can never be spent on
# in-box pool construction. Pregen out-of-band with tools/pregen_pool.py.
#
# Knobs (env, all optional):
#   PRETRAIN_RUN=pretrain_r5     PRETRAIN_CONFIG=runs/_cfg_pretrain_r4c.json
#   PRETRAIN_STEPS=78000         PRETRAIN_DEADLINE_MIN=0 (0 = no box)
#   PRETRAIN_SEED=46
#   FINETUNE_CONFIG=...          FINETUNE_STEPS=12000
#   FINETUNE_DEADLINE_MIN=0      FINETUNE_SEED=47
#   POOL=4000 VAL_POOL=180 BATCH=8 CLIP_S=2.5 VOICE=mix BG=0.5
#   RW= NIN= DENSE2=0            (curriculum: --radius_weights /
#                                 --nin_weights / --dense2_p)
#   STALE_MIN=6 GRACE_MIN=20
#
# Example (round-5 depth leg):
#   PRETRAIN_RUN=pretrain_r4c PRETRAIN_STEPS=78000 NIN=1.2,1,1.6 DENSE2=0.5 \
#     nohup setsid bash tools/run_campaign.sh r5a pretrain \
#     > runs/campaign_r5a.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

LEG=${1:?usage: run_campaign.sh LEG STAGE...}; shift
[ $# -ge 1 ] || { echo "no stages given"; exit 2; }

PRETRAIN_RUN=${PRETRAIN_RUN:-pretrain_$LEG}
PRETRAIN_CONFIG=${PRETRAIN_CONFIG:-runs/_cfg_pretrain_r4c.json}
PRETRAIN_STEPS=${PRETRAIN_STEPS:-78000}
PRETRAIN_DEADLINE_MIN=${PRETRAIN_DEADLINE_MIN:-0}
PRETRAIN_SEED=${PRETRAIN_SEED:-46}
FINETUNE_RUN=${FINETUNE_RUN:-finetune_$LEG}
FINETUNE_CONFIG=${FINETUNE_CONFIG:-runs/_cfg_finetune_$LEG.json}
FINETUNE_STEPS=${FINETUNE_STEPS:-12000}
FINETUNE_DEADLINE_MIN=${FINETUNE_DEADLINE_MIN:-0}
FINETUNE_SEED=${FINETUNE_SEED:-47}
POOL=${POOL:-4000}
VAL_POOL=${VAL_POOL:-180}
BATCH=${BATCH:-8}
CLIP_S=${CLIP_S:-2.5}
VOICE=${VOICE:-mix}
BG=${BG:-0.5}
RW=${RW:-}
NIN=${NIN:-}
DENSE2=${DENSE2:-0}
STALE_MIN=${STALE_MIN:-6}
GRACE_MIN=${GRACE_MIN:-20}
CACHE=runs/pool_cache

stamp() { date "+%F %T"; }

require_pool() {  # require_pool N SEED TAG
  local f="$CACHE/bg${3}_${2}_${1}.npz" cand
  # train_stream slices a larger same-seed pool; accept those too
  if [ ! -f "$f" ]; then
    for cand in "$CACHE"/bg${3}_*_${1}.npz; do
      [ -f "$cand" ] || continue
      local n; n=$(basename "$cand" .npz); n=${n%_*}; n=${n##*_}
      [ "$n" -ge "$2" ] && return 0
    done
    echo "[$(stamp)] FATAL: pool cache $f absent — pregen it first:" >&2
    echo "  python tools/pregen_pool.py --n $2 --seed $1 --tag $3 --bg" >&2
    exit 3
  fi
}

train_stage() {  # train_stage RUN CONFIG STEPS DEADLINE SEED
  local run=$1 config=$2 steps=$3 deadline=$4 seed=$5
  require_pool "$seed" "$POOL" train
  require_pool "$((seed + 500))" "$VAL_POOL" val
  local extra=()
  [ -n "$RW" ] && extra+=(--radius_weights "$RW")
  [ -n "$NIN" ] && extra+=(--nin_weights "$NIN")
  local box=()
  [ "$deadline" != 0 ] && box=(--deadline-min "$deadline")
  echo "[$(stamp)] stage $run: steps=$steps deadline=${deadline}min" \
       "seed=$seed RW=${RW:-none} NIN=${NIN:-none} DENSE2=$DENSE2"
  python tools/stall_watchdog.py --log "runs/$run/metrics.jsonl" \
      --stale-min "$STALE_MIN" --grace-min "$GRACE_MIN" "${box[@]}" \
      -- python src/train_stream.py --run_dir "runs/$run" \
         --config "$config" --steps "$steps" \
         --pool "$POOL" --val_pool "$VAL_POOL" --batch "$BATCH" --pool_bf16 \
         --clip_seconds "$CLIP_S" --voice "$VOICE" --bg_noise "$BG" \
         --seed "$seed" --dense2_p "$DENSE2" "${extra[@]}" \
         --plateau_patience 12 --pool_cache "$CACHE" --require_pool_cache \
         --resume \
      >> "runs/$run.log" 2>&1
  local rc=$?
  echo "[$(stamp)] stage $run done rc=$rc"
  return $rc
}

eval_stage() {  # eval_stage RUN SET
  local run=$1 set=$2 src out radius thr
  local tag=${set#data_eval_}
  for radius in 1m 1_5m 2m; do
    case $radius in 1m) thr=1.0;; 1_5m) thr=1.5;; 2m) thr=2.0;; esac
    if [ "$set" = goldens ]; then
      src=/root/reference/test_samples/syn_${radius}
    else
      src=$set/syn_${radius}/test
      [ -d "$src" ] || { echo "[$(stamp)] eval: $src absent, SKIP (set $set)"; continue; }
    fi
    out=runs/eval_${LEG}_${tag}/syn_${radius}
    echo "[$(stamp)] eval $run / $set / syn_${radius}"
    python tools/stall_watchdog.py --log "runs/eval_${LEG}_${tag}_syn_${radius}.log" \
        --stale-min "$STALE_MIN" --grace-min 6 --deadline-min 25 \
        -- python src/eval_syn.py "$src" "runs/$run" "$out" \
           --distance_threshold "$thr" \
        > "runs/eval_${LEG}_${tag}_syn_${radius}.log" 2>&1 \
        || echo "[$(stamp)] eval $set syn_${radius} FAILED"
  done
  JAX_PLATFORMS=cpu python tools/summarize_eval.py "runs/eval_${LEG}_${tag}" \
      > "runs/eval_${LEG}_${tag}_summary.txt" 2>&1
  sed -n 1,6p "runs/eval_${LEG}_${tag}_summary.txt"
}

echo "[$(stamp)] campaign $LEG: stages: $*"
for stage in "$@"; do
  case $stage in
    pretrain)
      train_stage "$PRETRAIN_RUN" "$PRETRAIN_CONFIG" "$PRETRAIN_STEPS" \
                  "$PRETRAIN_DEADLINE_MIN" "$PRETRAIN_SEED" \
        || { echo "[$(stamp)] ABORT at $stage"; exit 1; } ;;
    finetune)
      train_stage "$FINETUNE_RUN" "$FINETUNE_CONFIG" "$FINETUNE_STEPS" \
                  "$FINETUNE_DEADLINE_MIN" "$FINETUNE_SEED" \
        || { echo "[$(stamp)] ABORT at $stage"; exit 1; } ;;
    eval:*)
      IFS=: read -r _ run set <<< "$stage"
      eval_stage "$run" "$set" ;;
    *)
      echo "[$(stamp)] unknown stage '$stage'"; exit 2 ;;
  esac
done
echo "[$(stamp)] campaign $LEG complete"
touch "runs/campaign_$LEG.DONE"
