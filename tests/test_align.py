"""Smith-Waterman op tests: device wavefront vs the O(n^2) host oracle."""

import numpy as np
import pytest

from grid_tpu.ops.align import classify_reads, encode_seqs, sw_score_host, sw_scores


def _random_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def test_sw_matches_host_oracle(rng):
    refs = [_random_seq(rng, 40) for _ in range(3)]
    queries = []
    for _ in range(12):
        if rng.random() < 0.5:
            # read sampled from a ref with mutations
            ref = refs[int(rng.integers(3))]
            start = int(rng.integers(0, 20))
            read = list(ref[start : start + 20])
            for _ in range(2):
                read[int(rng.integers(len(read)))] = str(rng.choice(list("ACGT")))
            queries.append("".join(read))
        else:
            queries.append(_random_seq(rng, 20))

    scores = np.asarray(sw_scores(encode_seqs(queries), encode_seqs(refs)))
    for i, q in enumerate(queries):
        for j, ref in enumerate(refs):
            expect = sw_score_host(q, ref)
            assert scores[i, j] == expect, (i, j, scores[i, j], expect)


def test_sw_perfect_and_empty():
    refs = encode_seqs(["ACGTACGTAC"])
    qs = encode_seqs(["ACGTACGTAC", "TTTT", ""], length=10)
    scores = np.asarray(sw_scores(qs, refs))
    assert scores[0, 0] == 20  # perfect 10-mer match, match=2
    assert scores[2, 0] == 0  # empty read


def test_sw_gap_handling():
    # read = ref with one base deleted: best local alignment uses one gap
    ref = "ACGTACGTACGT"
    q = "ACGTAGTACGT"  # 'C' at pos 5 deleted
    s = np.asarray(sw_scores(encode_seqs([q]), encode_seqs([ref])))[0, 0]
    assert s == sw_score_host(q, ref)
    assert s == 2 * 11 - 2  # 11 matches, one gap


def test_classify_reads(rng):
    exon_a = _random_seq(rng, 60)
    exon_b = _random_seq(rng, 60)
    refs = encode_seqs([exon_a, exon_b])
    labels = ["1A", "1B"]

    reads = []
    truth = []
    for _ in range(20):
        src = int(rng.integers(2))
        seq = [exon_a, exon_b][src]
        start = int(rng.integers(0, 30))
        read = list(seq[start : start + 30])
        read[int(rng.integers(len(read)))] = str(rng.choice(list("ACGT")))
        reads.append("".join(read))
        truth.append(labels[src])
    # plus junk reads that must stay unassigned
    reads += [_random_seq(rng, 30) for _ in range(5)]
    truth += [None] * 5

    assigned, scores = classify_reads(
        encode_seqs(reads), refs, labels, min_score=40, margin=4
    )
    correct = sum(1 for a, t in zip(assigned[:20], truth[:20]) if a == t)
    assert correct >= 17, f"only {correct}/20 classified correctly"
    assert all(a is None for a in assigned[20:])
