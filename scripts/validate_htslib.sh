#!/usr/bin/env bash
# Cross-validate grid_tpu's self-contained CRAM stack against htslib —
# THE standing validation item (TODO.md #4): this environment has neither
# samtools nor pysam, so conformance currently rests on the adversarial
# corpus (tests/test_cram_conformance.py) and cross-implementation twins.
# Run this script on any machine with samtools to close the loop.
#
# Usage: bash scripts/validate_htslib.sh [workdir]
#
# Checks, in both directions:
#  1. samtools reads grid_tpu-written CRAMs (the vendored golden fixture +
#     fresh corpus files across every block codec) and the record streams
#     match the expected TSVs;
#  2. grid_tpu's two readers (cramlite + native cram.cpp) read a
#     samtools-written CRAM and match `samtools view` output.
set -euo pipefail

WORK="${1:-/tmp/grid_tpu_htslib_validation}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$WORK"
command -v samtools >/dev/null || { echo "samtools not on PATH"; exit 2; }

echo "== 1a. samtools reads the vendored golden fixture =="
samtools view -c "$REPO/tests/data/conformance/golden.cram" > "$WORK/golden.count"
python3 - "$REPO" "$WORK" <<'EOF'
import subprocess, sys
repo, work = sys.argv[1], sys.argv[2]
exp = [l.split("\t") for l in open(f"{repo}/tests/data/conformance/golden.expected.tsv").read().splitlines()[1:]]
n = int(open(f"{work}/golden.count").read())
assert n == len(exp), f"samtools sees {n} records, expected {len(exp)}"
out = subprocess.run(["samtools", "view", f"{repo}/tests/data/conformance/golden.cram"],
                     capture_output=True, text=True, check=True).stdout.splitlines()
assert len(out) == len(exp)
for line, e in zip(out, exp):
    f = line.split("\t")
    assert f[0] == e[0], (f[0], e[0])           # name
    assert int(f[1]) == int(e[3]), (f[1], e[3])  # flag
    assert int(f[3]) == int(e[2]) + 1, "POS is 1-based in SAM"
    assert int(f[4]) == int(e[4])               # mapq
    assert f[9] == e[5]                          # seq
print("golden fixture: samtools agrees on all", len(exp), "records")
EOF

echo "== 1b. samtools reads fresh corpus files (every codec) =="
PYTHONPATH="$REPO" python3 - "$WORK" <<'EOF'
import sys
from grid_tpu.io import cramlite as cl
import numpy as np
work = sys.argv[1]
rng = np.random.default_rng(7)
recs = []
pos = 10
for i in range(500):
    pos += int(rng.integers(1, 40))
    recs.append(dict(ref_id=0, pos=pos, flag=int(rng.choice([83,147,99,163])),
                     mapq=int(rng.integers(0,60)), rl=60,
                     seq="".join(rng.choice(list("ACGT"), size=60)),
                     name=f"c{i:05d}"))
for m, name in [(cl.RAW,"raw"),(cl.GZIP,"gzip"),(cl.BZIP2,"bzip2"),
                (cl.LZMA,"lzma"),(cl.RANS,"rans")]:
    cl.write_cram(f"{work}/codec_{name}.cram", [("chr1", 200000)],
                  [dict(r) for r in recs], method=m)
print("codec corpus written")
EOF
for c in raw gzip bzip2 lzma rans; do
  n=$(samtools view -c "$WORK/codec_$c.cram")
  [ "$n" = "500" ] || { echo "codec $c: samtools sees $n != 500"; exit 1; }
  echo "codec $c: ok (500 records)"
done

echo "== 2. grid_tpu readers decode a samtools-written CRAM =="
python3 - "$WORK" <<'EOF'
import random, sys
work = sys.argv[1]
random.seed(11)
ref = "".join(random.choice("ACGT") for _ in range(60000))
with open(f"{work}/ref.fa", "w") as f:
    f.write(">chr1\n")
    for i in range(0, len(ref), 60):
        f.write(ref[i:i+60] + "\n")
with open(f"{work}/in.sam", "w") as f:
    f.write("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:60000\n")
    pos = 100
    for i in range(400):
        pos += random.randint(1, 40)
        seq = ref[pos-1:pos+99]
        f.write(f"h{i:05d}\t99\tchr1\t{pos}\t60\t100M\t=\t{pos+150}\t250\t{seq}\t{'I'*100}\n")
print("sam written")
EOF
samtools faidx "$WORK/ref.fa"
samtools view -C -T "$WORK/ref.fa" -o "$WORK/hts.cram" "$WORK/in.sam"
PYTHONPATH="$REPO" python3 - "$WORK" <<'EOF'
import subprocess, sys
work = sys.argv[1]
from grid_tpu.io import cramlite as cl
sam = subprocess.run(["samtools", "view", f"{work}/hts.cram"],
                     capture_output=True, text=True, check=True).stdout.splitlines()
with cl.CramReader(f"{work}/hts.cram", reference=f"{work}/ref.fa") as rd:
    py = [(r.pos, r.flag, r.mapq, r.seq) for r in rd.iter_records(decode_seq=True)]
assert len(py) == len(sam), (len(py), len(sam))
for rec, line in zip(py, sam):
    f = line.split("\t")
    assert rec[0] + 1 == int(f[3]) and rec[1] == int(f[1]) and rec[3] == f[9]
print("cramlite reads htslib output:", len(py), "records exact")
from grid_tpu.native import cram as nc
nat = nc.dump_records(f"{work}/hts.cram")
assert nat.shape[0] == len(sam)
for row, line in zip(nat, sam):
    f = line.split("\t")
    assert row[1] + 1 == int(f[3]) and row[2] == int(f[1])
print("native cram.cpp reads htslib output:", nat.shape[0], "records exact")
EOF

echo "ALL HTSLIB CROSS-VALIDATION CHECKS PASSED"
