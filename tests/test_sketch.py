"""Mergeable sketches (stages/sketch.py): count-min never
undercounts, matches exact counts when collision-free, is invariant
to block layout; HLL registers equal a brute-force single-machine
computation and their standard estimate lands within the expected
error band."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd

from rust_paddle_ocr_ray.stages.sketch import (
    cms_estimate_tokens,
    hll_registers,
)


def _docs(n=300, seed=1):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(25)]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "text": [" ".join(rng.choice(vocab, rng.randint(3, 30)))
                 for _ in range(n)],
    })


def _true_counts(df):
    return (df["text"].str.lower().str.split().explode()
            .value_counts().to_dict())


def test_cms_never_undercounts_and_layout_invariant(ray_session):
    df = _docs()
    truth = _true_counts(df)
    outs = []
    for parts in (3, 17):
        got = (cms_estimate_tokens(rd.from_pandas(df).repartition(parts),
                                   "text", depth=4, width=16)
               .to_pandas().sort_values("token").reset_index(drop=True))
        outs.append(got)
        assert set(got["token"]) == set(truth)
        for t, e in zip(got["token"], got["est"]):
            assert e >= truth[t], (t, e, truth[t])
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # narrow width on 25 tokens: collisions must actually occur
    assert any(e > truth[t] for t, e in zip(outs[0]["token"], outs[0]["est"]))


def test_cms_exact_when_wide(ray_session):
    df = _docs(n=120, seed=2)
    truth = _true_counts(df)
    got = (cms_estimate_tokens(rd.from_pandas(df).repartition(5),
                               "text", depth=4, width=4096)
           .to_pandas())
    assert {t: e for t, e in zip(got["token"], got["est"])} == truth


def _rho_ref(key: str, p: int = 6) -> tuple[int, int]:
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    bucket, suffix = h % (1 << p), h >> p
    nbits = 32 - p
    return bucket, nbits - suffix.bit_length() + 1


def test_hll_registers_match_bruteforce_and_estimate(ray_session):
    keys = np.arange(1, 5001, dtype="int64")
    ref: dict[int, int] = {}
    for k in keys:
        b, r = _rho_ref(str(k))
        ref[b] = max(ref.get(b, 0), r)
    df = pd.DataFrame({"k": np.repeat(keys, 2)})  # dups must not matter
    got = (hll_registers(rd.from_pandas(df).repartition(9), "k")
           .to_pandas().sort_values("bucket"))
    assert dict(zip(got["bucket"], got["register"])) == ref
    # standard HLL estimate within ~3 sigma (sigma = 1.04/sqrt(64))
    m = 64
    regs = np.zeros(m)
    regs[got["bucket"].to_numpy()] = got["register"].to_numpy()
    est = 0.709 * m * m / np.sum(2.0 ** -regs)
    assert abs(est - 5000) / 5000 < 3 * 1.04 / np.sqrt(m)
