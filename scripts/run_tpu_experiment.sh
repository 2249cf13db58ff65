#!/bin/bash
# TPU-VM experiment launcher — the TPU-native analog of the reference's
# SLURM job (/root/reference/run_nfp_experiments_new.slurm: 1 node,
# 1x A100, 8h, runs demo.py on one experiment).
#
# On Cloud TPU there is no SLURM: you create a (possibly preemptible)
# TPU VM or queued resource, run the same command on every host of the
# slice, and the framework's jax.distributed layer (parallel/dist.py,
# auto-initialized by the CLI when TPU_WORKER_HOSTNAMES et al. are set)
# forms the mesh. This script is both halves:
#
#   LAUNCH (from your workstation; needs gcloud + an existing TPU):
#     TPU_NAME=my-v5e ZONE=us-west4-a ./scripts/run_tpu_experiment.sh launch \
#         --dataset EuroSAT --data_dir data/EuroSAT \
#         --model_type resnet18 --model_variant gap_only
#     -> runs the worker half on ALL hosts of the slice via
#        `gcloud compute tpus tpu-vm ssh --worker=all`.
#
#   WORKER (what runs on each TPU host; also fine standalone on 1 host):
#     ./scripts/run_tpu_experiment.sh worker --dataset EuroSAT ...
#
# Matches the SLURM job's behavior: per-experiment log directory, stdout
# and stderr captured, the training command is demo.py with the same
# flag surface. Differences are deliberate: checkpointing is
# preemption-safe (SIGTERM -> state-complete `last`; rerun with --resume
# continues), multi-host writes are leader-elected (NFP_TPU_SHARED_FS),
# and one slice trains all 3 seeds either serially (default, like the
# reference) or in one program (--seed_parallel).
set -euo pipefail

MODE="${1:?usage: run_tpu_experiment.sh launch|worker [demo.py flags...]}"
shift

# Experiment name: first --name wins, else derived like the SLURM file's
# ${variant}-${model}-${dataset}.
derive_name() {
    local dataset=unknown model=resnet18 variant=gap_only name=""
    local args=("$@")
    for i in "${!args[@]}"; do
        case "${args[$i]}" in
            --name)          name="${args[$((i+1))]:-}" ;;
            --dataset)       dataset="${args[$((i+1))]:-}" ;;
            --model_type)    model="${args[$((i+1))]:-}" ;;
            --model_variant) variant="${args[$((i+1))]:-}" ;;
        esac
    done
    if [[ -n "${name}" ]]; then echo "${name}"; else
        echo "${variant}-${model}-${dataset}" | tr '[:upper:]' '[:lower:]'
    fi
}

EXPERIMENT_NAME="$(derive_name "$@")"
LOG_DIR="${NFP_TPU_LOG_DIR:-logs}/${EXPERIMENT_NAME}"

case "${MODE}" in
launch)
    : "${TPU_NAME:?set TPU_NAME (gcloud TPU VM / queued resource name)}"
    : "${ZONE:?set ZONE (e.g. us-west4-a)}"
    REPO_DIR="${REPO_DIR:-\$HOME/neighbour_feature_pooling_tpu}"
    exec gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" \
        --worker=all --command \
        "cd ${REPO_DIR} && ./scripts/run_tpu_experiment.sh worker $*"
    ;;
worker)
    mkdir -p "${LOG_DIR}"
    echo "[run_tpu_experiment] ${EXPERIMENT_NAME} -> ${LOG_DIR}" >&2
    # Inject the derived --name only when the caller didn't pass one.
    NAME_ARGS=(--name "${EXPERIMENT_NAME}")
    for a in "$@"; do [[ "$a" == "--name" ]] && NAME_ARGS=(); done
    # stdout+stderr captured like the SLURM --output/--error pair;
    # %j has no meaning here, the timestamp disambiguates retries.
    STAMP="$(date +%Y%m%d-%H%M%S)"
    exec python demo.py "${NAME_ARGS[@]}" "$@" \
        > >(tee "${LOG_DIR}/run_${STAMP}.out") \
        2> >(tee "${LOG_DIR}/run_${STAMP}.err" >&2)
    ;;
*)
    echo "unknown mode '${MODE}' (launch|worker)" >&2
    exit 2
    ;;
esac
