#!/usr/bin/env bash
# ONE-COMMAND reproduction of the reference's headline numbers, for the day
# the real datasets + OpenAI RN50 checkpoint exist (scripts/reproduce_reference.md).
#
#   bash scripts/reproduce_all.sh [/path/to/RN50.pt]
#
# Chain: Stage-A extraction (both datasets) -> headline sweeps (WB grid x 3
# seeds, CA bsr grid x 3 seeds, vmapped) -> ablation tables -> automated diff
# vs BASELINE.md (exits non-zero if any produced cell misses the 0.5 pt
# north-star band).
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT="${1:-$HOME/.cache/clip/RN50.pt}"
CKPT_ARGS=()
if [ -f "$CKPT" ]; then
  CKPT_ARGS=(--checkpoint "$CKPT")
else
  echo "NOTE: $CKPT not found; weights/zoo.py will download+verify RN50" >&2
fi

# ---- Stage A: embeddings for both datasets
bash scripts/save_embedding.sh "${CKPT_ARGS[@]}"

# ---- Stage B: headline sweeps (results land in results_iterative/)
bash scripts/run_sweep_wb.sh
bash scripts/run_sweep_ca.sh

# ---- ablation rows used by check_vs_baseline (the exact configurations the
# reference's ablations notebook reads, cells 7-21)
emb="data/embeddings_unnormalized/waterbirds"
common=(--dataset waterbirds
  --text_embedding_dir "$emb/clip_class.json"
  --text_spurious_embedding_dir "$emb/clip_spurious.json"
  --text_group_embedding_dir "$emb/clip_group.json"
  --image_embedding_dir "$emb/RN50/clip.npz"
  --data_dir data/waterbirds/waterbird_complete95_forest2water2
  --num_iter 3 --random_seeds 42,32,22 --lr_decay_rate 0.1
  --epochs 100 --lr_decay_epochs 90,95)
two_phase=(--epochs_feature_learning 40 --warm_reg --lr_multiple 1.0)
python -m debiasing_multi_modal_tpu.cli.sweep_main "${common[@]}" \
  --tl_method linear_probing --lr_list 1 --bs_list 512 --bsr_list 64
python -m debiasing_multi_modal_tpu.cli.sweep_main "${common[@]}" \
  --tl_method adapter --lr_list 10 --bs_list 1024 --bsr_list 64
python -m debiasing_multi_modal_tpu.cli.sweep_main "${common[@]}" "${two_phase[@]}" \
  --tl_method adapter_reg --lr_list 10 --bs_list 512 --bsr_list 256
python -m debiasing_multi_modal_tpu.cli.sweep_main "${common[@]}" "${two_phase[@]}" \
  --tl_method adapter_reg --use_cls_prompt_in_reg \
  --lr_list 10 --bs_list 512 --bsr_list 64
python -m debiasing_multi_modal_tpu.cli.sweep_main "${common[@]}" "${two_phase[@]}" \
  --tl_method adapter_reg_seq --add_adapter \
  --lr_list 1 --bs_list 1024 --bsr_list 64
python -m debiasing_multi_modal_tpu.cli.sweep_main "${common[@]}" "${two_phase[@]}" \
  --tl_method adapter_reg_seq --use_cls_prompt_in_reg --add_adapter \
  --lr_list 10 --bs_list 512 --bsr_list 256
python -m debiasing_multi_modal_tpu.cli.sweep_main "${common[@]}" "${two_phase[@]}" \
  --tl_method adapter_reg_seq_alter \
  --lr_list 10 --bs_list 512 --bsr_list 256
python -m debiasing_multi_modal_tpu.cli.sweep_main "${common[@]}" "${two_phase[@]}" \
  --tl_method adapter_reg_seq_alter --balance_val --add_adapter \
  --lr_list 1 --bs_list 1024 --bsr_list 512

# ---- report tables + automated acceptance diff
python scripts/ablation_tables.py results_iterative
python scripts/check_vs_baseline.py results_iterative
