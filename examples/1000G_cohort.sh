#!/usr/bin/env bash
# 1000 Genomes cohort run for grid_tpu — the operational asset mirroring the
# reference workflow (ref examples/1000G_example.sh): stream each sample's
# locus window from the EBI mirror, keep a failed-sample ledger with retry,
# skip work that already exists, auto-generate the config, run the pipeline.
#
# grid_tpu differences from the reference script:
#   * the VNTR window comes from the BUNDLED 734-region catalog (no download;
#     pick any gene with --locus), resolved by `grid-tpu loci`;
#   * a --dry-run mode exercises every phase — manifest, fetch with one
#     injected transient failure, retry pass, ledger, config generation,
#     pipeline — on a fabricated cohort with zero network/external tools;
#   * failed samples get one automatic retry pass (the reference leaves
#     failed_samples.txt for a manual re-run);
#   * the pipeline itself needs no mosdepth/pysam (built-in ingestion);
#     only the REMOTE STREAMING needs samtools + wget.
#
# Usage: 1000G_cohort.sh [--n N] [--pop POP] [--jobs J] [--locus GENE]
#                        [--dry-run] [WORKDIR]
#   --n N        use only the first N panel samples (0 = all 2,504)
#   --pop POP    restrict to a superpopulation column value (e.g. EUR)
#   --jobs J     parallel fetch streams (default: min(threads, 4))
#   --locus GENE catalog gene for the window (default LPA)
#   --dry-run    no network: fabricate the cohort, still run all phases
set -euo pipefail

N_SAMPLES=0
POP_FILTER=""
JOBS=0
LOCUS="LPA"
DRY_RUN=0
WORK_DIR=""

while [[ $# -gt 0 ]]; do
    case "$1" in
        --n) N_SAMPLES="$2"; shift 2 ;;
        --pop) POP_FILTER="$2"; shift 2 ;;
        --jobs) JOBS="$2"; shift 2 ;;
        --locus) LOCUS="$2"; shift 2 ;;
        --dry-run) DRY_RUN=1; shift ;;
        -h|--help) sed -n '2,30p' "$0" | sed 's/^# \{0,1\}//'; exit 0 ;;
        *) WORK_DIR="$1"; shift ;;
    esac
done

WORK_DIR="${WORK_DIR:-$(pwd)/grid_tpu_1000G}"
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
GRID="python -m grid_tpu.cli"

CRAM_DIR="$WORK_DIR/crams"
DATA_DIR="$WORK_DIR/data"
LOG_DIR="$WORK_DIR/logs"
OUT_DIR="$WORK_DIR/output"
MOSDEPTH_WORK="$WORK_DIR/mosdepth_work"
mkdir -p "$CRAM_DIR" "$DATA_DIR" "$LOG_DIR" "$OUT_DIR" "$MOSDEPTH_WORK"

THREADS="${SLURM_CPUS_PER_TASK:-$(nproc)}"
[[ "$JOBS" -gt 0 ]] || JOBS=$(( THREADS < 4 ? THREADS : 4 ))
FAILED_LOG="$LOG_DIR/failed_samples.txt"
stamp() { date '+%Y-%m-%d %H:%M:%S'; }
log() { echo "[$(stamp)] $*" | tee -a "$LOG_DIR/run.log"; }

# ---- phase 0: dependencies + locus window from the bundled catalog --------
if [[ "$DRY_RUN" -eq 0 ]]; then
    missing=()
    for cmd in samtools wget; do
        command -v "$cmd" >/dev/null || missing+=("$cmd")
    done
    if [[ ${#missing[@]} -gt 0 ]]; then
        echo "ERROR: remote streaming needs: ${missing[*]} (the pipeline" \
             "itself does not — use --dry-run for a network-free demo)" >&2
        exit 1
    fi
fi

read -r REGION_CHR REGION_START REGION_END < <(
python - "$LOCUS" <<'PY'
import sys
from grid_tpu.data.loci import resolve_locus
l = resolve_locus(sys.argv[1])
print(l.chrom, l.start, l.end)
PY
) || { echo "ERROR: locus $LOCUS not in the bundled VNTR catalog" >&2; exit 1; }
REGION="$REGION_CHR:$REGION_START-$REGION_END"
FOCAL_BP=$(( (REGION_START + REGION_END) / 2 ))
log "Locus $LOCUS -> $REGION (focal $FOCAL_BP)"

PANEL_URL="https://ftp.1000genomes.ebi.ac.uk/vol1/ftp/release/20130502/integrated_call_samples_v3.20130502.ALL.panel"
EBI_BASE="https://ftp.1000genomes.ebi.ac.uk/vol1/ftp/data_collections/1000_genomes_project/data"
REF_FA="$DATA_DIR/GRCh38_full_analysis_set_plus_decoy_hla.fa"
REF_URL="https://ftp.1000genomes.ebi.ac.uk/vol1/ftp/technical/reference/GRCh38_reference_genome/GRCh38_full_analysis_set_plus_decoy_hla.fa"
REPEAT_MASK="$DATA_DIR/repeat_mask.hg38.bed"
REPEAT_MASK_URL="https://raw.githubusercontent.com/alexliyihao/vntrwrap/main/normalize_mosdepth/external_source/repeat_mask_list.hg38.ucsc_bed"

fetch_retry() {  # url out  — up to 4 attempts with backoff
    local url="$1" out="$2" try
    for try in 1 2 3 4; do
        wget -q --tries=1 --timeout=60 -O "$out" "$url" && return 0
        rm -f "$out"; sleep $(( try * 2 ))
    done
    return 1
}

# ---- phase 1: manifest (sample_id<TAB>population) --------------------------
MANIFEST="$DATA_DIR/manifest.tsv"
if [[ "$DRY_RUN" -eq 1 ]]; then
    if [[ ! -s "$MANIFEST" ]]; then
        n=$(( N_SAMPLES > 0 ? N_SAMPLES : 8 ))
        log "dry-run: fabricating a $n-sample cohort pool"
        python - "$DATA_DIR" "$n" "$REGION_CHR" "$REGION_START" "$REGION_END" <<'PY'
import sys
from grid_tpu.synth import make_synthetic_cohort_with_alignments
out, n, chrom, start, end = sys.argv[1:]
make_synthetic_cohort_with_alignments(
    f"{out}/pool", n_samples=int(n), chrom=chrom,
    window_start=int(start), window_end=min(int(start) + 10_000, int(end)),
    seed=11,
)
PY
        awk '{print $1 "\tSYN"}' "$DATA_DIR/pool/samples.txt" > "$MANIFEST"
    fi
else
    if [[ ! -s "$DATA_DIR/panel.txt" ]]; then
        log "downloading 1000G panel..."
        fetch_retry "$PANEL_URL" "$DATA_DIR/panel.txt"
    fi
    if [[ -n "$POP_FILTER" ]]; then
        awk -v p="$POP_FILTER" 'NR>1 && ($3==p || $2==p) {print $1 "\t" $2}' \
            "$DATA_DIR/panel.txt" > "$MANIFEST"
    else
        awk 'NR>1 {print $1 "\t" $2}' "$DATA_DIR/panel.txt" > "$MANIFEST"
    fi
fi
if [[ "$N_SAMPLES" -gt 0 ]]; then
    head -n "$N_SAMPLES" "$MANIFEST" > "$MANIFEST.tmp" && mv "$MANIFEST.tmp" "$MANIFEST"
fi
log "manifest: $(wc -l < "$MANIFEST") samples"

# ---- phase 2: reference genome (skip-if-exists) ----------------------------
if [[ "$DRY_RUN" -eq 0 && ! -f "$REF_FA" ]]; then
    log "downloading GRCh38 reference (large; resumable re-runs skip this)..."
    fetch_retry "$REF_URL" "$REF_FA"
    fetch_retry "$REF_URL.fai" "$REF_FA.fai" || samtools faidx "$REF_FA"
fi
if [[ "$DRY_RUN" -eq 0 && ! -s "$REPEAT_MASK" ]]; then
    log "downloading hg38 repeat mask..."
    fetch_retry "$REPEAT_MASK_URL" "$REPEAT_MASK" || : > "$REPEAT_MASK"
fi
[[ -s "$REPEAT_MASK" ]] || : > "$REPEAT_MASK"

# ---- phase 3: per-sample fetch (skip-if-exists + failure ledger) -----------
fetch_one() {  # sample pop  -> 0 ok, 1 failed (appended to ledger)
    local sample="$1" pop="$2"
    local out="$CRAM_DIR/$sample.cram"
    if [[ "$DRY_RUN" -eq 1 ]]; then
        out="$CRAM_DIR/$sample.bam"
        [[ -f "$out" ]] && return 0
        # injected transient failure: first attempt at the first sample
        # fails so the retry pass is exercised on every dry run
        if [[ "$sample" == "$(head -1 "$MANIFEST" | cut -f1)" \
              && ! -f "$LOG_DIR/.inject_done" ]]; then
            touch "$LOG_DIR/.inject_done"
            echo "$sample" >> "$FAILED_LOG"
            return 1
        fi
        cp "$DATA_DIR/pool/alignments/$sample.bam" "$out"
        return 0
    fi
    [[ -f "$out" && -f "$out.crai" ]] && return 0
    local dir_url="$EBI_BASE/$pop/$sample/alignment/"
    local listing cram_name try
    for try in 1 2 3; do
        listing=$(wget -qO- --tries=1 --timeout=45 "$dir_url" 2>/dev/null) && break
        sleep $(( try * 2 ))
    done
    cram_name=$(grep -oE "${sample}[A-Za-z0-9._-]*\.cram" <<<"${listing:-}" | head -1)
    if [[ -z "$cram_name" ]]; then
        echo "$sample" >> "$FAILED_LOG"; return 1
    fi
    if ! samtools view -T "$REF_FA" -C -o "$out" "$dir_url$cram_name" "$REGION" \
        || ! samtools index "$out"; then
        rm -f "$out" "$out.crai"
        echo "$sample" >> "$FAILED_LOG"; return 1
    fi
}
export -f fetch_one
export CRAM_DIR DATA_DIR LOG_DIR FAILED_LOG MANIFEST DRY_RUN EBI_BASE REF_FA REGION

: > "$FAILED_LOG"
log "fetching $(wc -l < "$MANIFEST") samples ($JOBS streams)..."
xargs -P "$JOBS" -n 2 bash -c 'fetch_one "$1" "$2"' _ < "$MANIFEST" \
    >> "$LOG_DIR/fetch.log" 2>&1 || true

# one automatic retry pass over the ledger, then keep it for manual re-runs
if [[ -s "$FAILED_LOG" ]]; then
    log "retrying $(wc -l < "$FAILED_LOG") failed samples once..."
    sort -u "$FAILED_LOG" > "$FAILED_LOG.retry"; : > "$FAILED_LOG"
    while read -r sample; do
        pop=$(awk -v s="$sample" '$1==s {print $2; exit}' "$MANIFEST")
        fetch_one "$sample" "$pop" >> "$LOG_DIR/fetch.log" 2>&1 || true
    done < "$FAILED_LOG.retry"
    rm -f "$FAILED_LOG.retry"
fi
if [[ -s "$FAILED_LOG" ]]; then
    log "WARNING: $(wc -l < "$FAILED_LOG") samples failed twice" \
        "(see $FAILED_LOG); continuing with the rest"
fi

# ---- phase 4: samples file from what actually landed ------------------------
SAMPLES_FILE="$DATA_DIR/samples.txt"
: > "$SAMPLES_FILE"
shopt -s nullglob
for f in "$CRAM_DIR"/*.cram "$CRAM_DIR"/*.bam; do
    b=$(basename "$f"); echo "${b%.*}" >> "$SAMPLES_FILE"
done
shopt -u nullglob
N_OK=$(wc -l < "$SAMPLES_FILE")
[[ "$N_OK" -gt 0 ]] || { echo "ERROR: no samples fetched" >&2; exit 1; }
log "$N_OK samples ready"

# ---- phase 5: auto-generated config + run -----------------------------------
CONFIG="$WORK_DIR/config.yaml"
FILE_TYPE="cram"; REF_LINE="$REF_FA"
NBR=$(( N_OK > 6 ? 5 : N_OK - 1 ))
if [[ "$DRY_RUN" -eq 1 ]]; then
    FILE_TYPE="bam"; REF_LINE="$SAMPLES_FILE"
    REGION_END=$(( REGION_START + 30000 > REGION_END ? REGION_END : REGION_START + 30000 ))
fi
cat > "$CONFIG" <<YAML
# auto-generated by examples/1000G_cohort.sh ($(stamp))
samples_file: "$SAMPLES_FILE"
directory_loc: "$CRAM_DIR"
reference_genome: "$REF_LINE"
output_dir: "$OUT_DIR"
threads: $THREADS
file_type: "$FILE_TYPE"
chrom: "$REGION_CHR"
start_bp: $REGION_START
end_bp: $REGION_END
output_file_type: "tsv"
index:
  run: True
  output_file_prefix: "index_file_results"
count_reads:
  run: True
  output_file_prefix: "read_counts"
  flags: [83, 147, 81, 145]
mosdepth:
  run: True
  output_file_prefix: "mosdepth_results"
  bin_size: 1000
  mode: "fast"
  region_name: "$LOCUS"
  work_dir: "$MOSDEPTH_WORK"
  remove_intermediate: False
  # locus-subset CRAMs: zero-depth bins are ~99% of a genome-wide grid and
  # downstream drops them anyway (built-in binners only; no-op for mosdepth)
  sparse_bed: True
  normalize:
    run: True
    min_depth: 1
    max_depth: 100
    top_frac: 0.1
    output_file_prefix: "mosdepth_results_normalized"
    repeat_mask_file: "$REPEAT_MASK"
  neighbors:
    run: True
    output_file_prefix: "neighbor_coverage"
    num_neighbors: $NBR
    zmax: 2.0
    sigma2_max: 1000
compute_diploid_genotypes:
  run: True
  output_file_prefix: "diploid_genotypes"
  n_nbr: $NBR
compute_haploid_genotypes:
  run: False   # flip on with an IBS/IBD file, or add a compute_ibs section
  output_file_prefix: "haploid_genotypes"
  method: "ibs"
YAML
log "config: $CONFIG"

log "running grid_tpu wgs..."
$GRID wgs "$CONFIG"
log "done — results in $OUT_DIR"
