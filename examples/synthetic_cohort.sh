#!/usr/bin/env bash
# End-to-end demo on a fabricated cohort — no external data, no network.
#
# Fabricates a BAM cohort with planted copy-number structure, runs the full
# seven-step pipeline (native BAM ingestion -> TPU cohort math), and prints
# the haploid copy-number table next to the planted truth.
set -euo pipefail

OUT="${1:-/tmp/grid_tpu_demo}"
N="${2:-16}"

REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

echo ">> Fabricating a $N-sample cohort with BAM alignments at $OUT"
python - <<PY
from grid_tpu.synth import make_synthetic_cohort_with_alignments
c = make_synthetic_cohort_with_alignments("$OUT", n_samples=$N, seed=1)
print("config:", c["config_file"])
PY

echo ">> Running the pipeline"
python -m grid_tpu.cli wgs "$OUT/config.yaml"

echo ">> Estimated haploid copy numbers:"
head -n $((N + 1)) "$OUT/results/haploid_genotypes.tsv"

echo ">> Planted truth:"
head -n $((N + 1)) "$OUT/results/truth_hap_cn.tsv"

echo ">> Per-step timings:"
cat "$OUT/results/step_timings.json"
