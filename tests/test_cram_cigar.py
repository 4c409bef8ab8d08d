"""CIGAR preservation through the CRAM stack (round 3, TODO #5).

Non-trivial CIGARs round-trip as CRAM features: S/I/D/N/H/P ops map to
their feature codes (spec §10.4); M runs store verbatim 'b' stretches or —
with a reference at hand — substitution features per M segment. Both
writers (cramlite.write_cram and the native C++ grid_cram_write) and both
readers (cramlite + native cram.cpp ref_len accounting) are pinned against
each other and the written ground truth. The reference defers all of this
to htslib (grid/utils/subset_cram.py:26-32); before round 3 our writers
stored indel reads as all-M, silently rewriting alignment spans.
"""

import random

import numpy as np
import pytest

from grid_tpu.io import cramlite as cl


@pytest.fixture()
def native_cram():
    try:
        from grid_tpu import native
        from grid_tpu.native import cram as nc

        native.lib()
        return nc
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build failed: {e}")


CASES = [
    ("soft_ins_del", [("S", 3), ("M", 5), ("I", 2), ("M", 4), ("D", 7), ("M", 6)]),
    ("splice", [("M", 4), ("N", 50), ("M", 6)]),
    ("hard_pad", [("H", 5), ("M", 4), ("P", 2), ("M", 4), ("H", 2)]),
    ("lead_trail_clip", [("S", 2), ("M", 6), ("S", 2)]),
    ("del_between_matches", [("M", 1), ("D", 1), ("M", 1), ("D", 2), ("M", 8)]),
    ("all_match", [("M", 10)]),
]

_READ_OPS = "MIS=X"


def _read_len(cigar):
    return sum(n for op, n in cigar if op in _READ_OPS)


def _ref_len(cigar):
    return sum(n for op, n in cigar if op in "MDN=X")


def _mk_rec(i, cigar, pos, rng):
    rl = _read_len(cigar)
    return cl.CramRecord(
        name=f"c{i:04d}", flag=0, ref_id=0, pos=pos, mapq=42, rl=rl,
        seq="".join(rng.choice(list("ACGT"), size=rl)),
        qual=bytes(rng.integers(2, 40, size=rl).tolist()), cigar=list(cigar),
    )


def _case_records(seed=3):
    rng = np.random.default_rng(seed)
    return [_mk_rec(i, cig, 100 + 50 * i, rng)
            for i, (_label, cig) in enumerate(CASES)]


def _check_roundtrip(path, recs, native_cram=None):
    with cl.CramReader(path) as rd:
        out = list(rd.iter_records())
    assert len(out) == len(recs)
    for a, b in zip(recs, out):
        exp = [(op, n) for op, n in a.cigar]
        # ops that consume nothing collapse into canonical merged form on
        # reconstruction; our cases are already canonical
        assert b.cigar == exp, (a.name, b.cigar, exp)
        assert b.seq == a.seq, a.name
        assert b.qual == a.qual, a.name
        assert b.pos == a.pos and b.flag == a.flag and b.mapq == a.mapq
        assert b.ref_len == _ref_len(a.cigar), a.name
    if native_cram is not None:
        nat = native_cram.dump_records(str(path))
        assert list(nat[:, 5]) == [_ref_len(r.cigar) for r in recs]


def test_python_writer_preserves_cigars(tmp_path, native_cram):
    recs = _case_records()
    p = tmp_path / "py.cram"
    cl.write_cram(p, [("chr1", 100000)], recs)
    _check_roundtrip(p, recs, native_cram)


def test_native_writer_preserves_cigars(tmp_path, native_cram):
    recs = _case_records()
    p = tmp_path / "nat.cram"
    native_cram.write_cram(p, [("chr1", 100000)], recs)
    _check_roundtrip(p, recs, native_cram)


@pytest.mark.parametrize("writer", ["python", "native"])
def test_noseq_records_keep_cigars(tmp_path, native_cram, writer):
    """Mapped records with SEQ '*' (seq=None) keep their CIGAR through the
    round trip (round-4 close-out of builder TODO #6): the writers emit the
    positional S/I/D/N/H/P features with placeholder bases under CF_NO_SEQ,
    and the readers rebuild the CIGAR while leaving seq=None."""
    rng = np.random.default_rng(11)
    recs = []
    for i, (_label, cig) in enumerate(CASES):
        r = _mk_rec(i, cig, 100 + 50 * i, rng)
        r.seq = None
        r.qual = None
        recs.append(r)
    p = tmp_path / f"{writer}_noseq.cram"
    if writer == "python":
        cl.write_cram(p, [("chr1", 100000)], recs)
    else:
        native_cram.write_cram(p, [("chr1", 100000)], recs)
    with cl.CramReader(p) as rd:
        out = list(rd.iter_records())
    assert len(out) == len(recs)
    for a, b in zip(recs, out):
        assert b.seq is None, a.name
        assert b.cigar == list(a.cigar), (a.name, b.cigar)
        assert b.ref_len == _ref_len(a.cigar), a.name
        assert b.pos == a.pos and b.mapq == a.mapq
    # native reader agrees on the reference spans
    nat = native_cram.dump_records(str(p))
    assert list(nat[:, 5]) == [_ref_len(r.cigar) for r in recs]


def test_writers_agree_on_random_cigars(tmp_path, native_cram):
    """Fuzz: random CIGARs through both writers -> identical decoded record
    streams (cigar, seq, qual, ref_len)."""
    rng = np.random.default_rng(11)
    pyrng = random.Random(11)
    recs = []
    pos = 50
    for i in range(200):
        pos += int(rng.integers(1, 30))
        cig = []
        # interior ops; clips only at the ends (SAM validity)
        if pyrng.random() < 0.3:
            cig.append(("S", pyrng.randint(1, 5)))
        cig.append(("M", pyrng.randint(1, 30)))
        for _ in range(pyrng.randint(0, 3)):
            cig.append((pyrng.choice("IDN"), pyrng.randint(1, 12)))
            cig.append(("M", pyrng.randint(1, 30)))
        if pyrng.random() < 0.3:
            cig.append(("S", pyrng.randint(1, 5)))
        recs.append(_mk_rec(i, cig, pos, rng))
    pa, pb = tmp_path / "a.cram", tmp_path / "b.cram"
    cl.write_cram(pa, [("chr1", 10**6)], recs)
    native_cram.write_cram(pb, [("chr1", 10**6)], recs)
    with cl.CramReader(pa) as rd:
        da = [(r.cigar, r.seq, r.qual, r.ref_len) for r in rd.iter_records()]
    with cl.CramReader(pb) as rd:
        db = [(r.cigar, r.seq, r.qual, r.ref_len) for r in rd.iter_records()]
    assert da == db
    for rec, (cig, seq, qual, ref_len) in zip(recs, da):
        assert cig == rec.cigar and seq == rec.seq and qual == rec.qual
        assert ref_len == _ref_len(rec.cigar)


@pytest.mark.parametrize("embed", [False, True])
def test_refbased_write_preserves_cigars(tmp_path, native_cram, embed):
    """With a FASTA, M segments of indel reads substitution-encode against
    the reference at the CORRECT reference offsets (D/N shift them); the
    file must decode to the exact seq + cigar, and without the FASTA the
    match positions must come back as N (proof the bases were NOT stored
    verbatim)."""
    rng = np.random.default_rng(17)
    ref_seq = "".join(rng.choice(list("ACGT"), size=20000))
    fasta = tmp_path / "ref.fa"
    fasta.write_text(">chr1\n" + "\n".join(
        ref_seq[i:i + 60] for i in range(0, len(ref_seq), 60)) + "\n")
    recs = []
    pos = 100
    for i in range(40):
        pos += int(rng.integers(10, 60))
        cig = [("M", 20), ("D", 5), ("M", 20), ("I", 4), ("M", 10)]
        m1 = list(ref_seq[pos:pos + 20])
        m1[3] = "ACGT"[("ACGT".index(m1[3]) + 1) % 4]  # one substitution
        m2 = ref_seq[pos + 25:pos + 45]  # after the 5-base deletion
        ins = "".join(rng.choice(list("ACGT"), size=4))
        m3 = ref_seq[pos + 45:pos + 55]
        seq = "".join(m1) + m2 + ins + m3
        recs.append(cl.CramRecord(name=f"r{i:03d}", flag=0, ref_id=0, pos=pos,
                                  mapq=60, rl=len(seq), seq=seq,
                                  qual=bytes([30] * len(seq)), cigar=cig))
    p = tmp_path / "refb.cram"
    cl.write_cram(p, [("chr1", len(ref_seq))], recs, reference=str(fasta),
                  embed_reference=embed)
    reference = None if embed else str(fasta)
    with cl.CramReader(p, reference=reference) as rd:
        out = list(rd.iter_records())
    for a, b in zip(recs, out):
        assert b.cigar == a.cigar, a.name
        assert b.seq == a.seq, a.name
        assert b.ref_len == 55, a.name
    if not embed:
        # without the FASTA: inserted bases are literal, matches become N
        with cl.CramReader(p) as rd:
            blind = list(rd.iter_records())
        for a, b in zip(recs, blind):
            assert b.seq[40:44] == a.seq[40:44], a.name  # the insertion
            assert set(b.seq[:3]) == {"N"}, a.name  # unsubstituted match


def test_subset_cram_preserves_cigars(tmp_path, native_cram):
    """tools.subset_alignment on a CRAM with indel reads keeps their
    CIGARs (the whole point of TODO #5: subsets are archives)."""
    from grid_tpu.tools import subset_alignment

    rng = np.random.default_rng(23)
    recs = []
    for i in range(60):
        cig = [("S", 2), ("M", 10), ("D", 3), ("M", 10)] if i % 2 else [("M", 22)]
        recs.append(_mk_rec(i, cig, 1000 + 40 * i, rng))
    src = tmp_path / "src.cram"
    cl.write_cram(src, [("chr1", 100000)], recs)
    out = tmp_path / "sub.cram"
    n = subset_alignment(src, "chr1", 1500, 2500, out)
    assert n > 0
    with cl.CramReader(out) as rd:
        subs = {r.name: r for r in rd.iter_records()}
    kept = [r for r in recs if r.name in subs]
    assert kept
    for a in kept:
        assert subs[a.name].cigar == a.cigar, a.name
        assert subs[a.name].seq == a.seq, a.name


def test_cigar_read_length_mismatch_rejected(tmp_path):
    r = cl.CramRecord(name="bad", flag=0, ref_id=0, pos=10, mapq=1, rl=10,
                      seq="ACGTACGTAC", qual=bytes([9] * 10),
                      cigar=[("M", 4)])  # 4 != rl 10
    with pytest.raises(ValueError, match="CIGAR read length"):
        cl.write_cram(tmp_path / "bad.cram", [("chr1", 1000)], [r])


def test_noseq_rl_zero_healed_from_cigar(tmp_path):
    """seq=None with rl=0 and a non-trivial CIGAR: the CIGAR is the only
    read-length carrier, so the writer heals rl instead of truncating the
    S/I placeholder payloads; a genuinely inconsistent rl raises."""
    r = cl.CramRecord(name="heal", flag=0, ref_id=0, pos=10, mapq=1, rl=0,
                      seq=None, qual=None,
                      cigar=[("S", 5), ("M", 95)])
    p = tmp_path / "heal.cram"
    cl.write_cram(p, [("chr1", 100000)], [r])
    with cl.CramReader(p) as rd:
        back = list(rd.iter_records())
    assert back[0].cigar == [("S", 5), ("M", 95)]
    assert back[0].seq is None

    bad = cl.CramRecord(name="bad", flag=0, ref_id=0, pos=10, mapq=1, rl=7,
                        seq=None, qual=None,
                        cigar=[("S", 5), ("M", 95)])  # 100 != rl 7
    with pytest.raises(ValueError, match="CIGAR read length"):
        cl.write_cram(tmp_path / "bad.cram", [("chr1", 100000)], [bad])
