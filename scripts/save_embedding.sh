#!/usr/bin/env bash
# Stage A: extract embeddings for both datasets (reference save_embedding.sh).
# Pass --checkpoint /path/to/RN50.pt to use real OpenAI weights.
set -euo pipefail
cd "$(dirname "$0")/.."

EXTRA_ARGS=("$@")
DATA_ROOT="${REPRO_DATA_ROOT:-data}"

# celeba
python -m debiasing_multi_modal_tpu.cli.extract_main \
  --data_dir "$DATA_ROOT" --dataset celeba --embedding_dir embeddings_unnormalized \
  --save --split all --backbone RN50 "${EXTRA_ARGS[@]}"

# waterbirds
python -m debiasing_multi_modal_tpu.cli.extract_main \
  --data_dir "$DATA_ROOT" --dataset waterbirds --embedding_dir embeddings_unnormalized \
  --save --split all --backbone RN50 "${EXTRA_ARGS[@]}"
