"""Input pipeline: background prefetch iterator + bucketed SizePlans."""

from __future__ import annotations

import threading
import time

import numpy as np
import pytest

from geobignn_tpu.config import Config
from geobignn_tpu.data import synth
from geobignn_tpu.data.builder import BuildConfig
from geobignn_tpu.data.dataset import InMemoryDataset
from geobignn_tpu.data.prefetch import prefetch_iter
from geobignn_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow



def test_prefetch_order_and_overlap():
    seen_threads = set()

    def fetch(i):
        seen_threads.add(threading.get_ident())
        time.sleep(0.002)
        return i * 10

    out = list(prefetch_iter(range(20), fetch, depth=3))
    assert out == [i * 10 for i in range(20)]
    assert threading.get_ident() not in seen_threads  # ran off-thread


def test_prefetch_depth_zero_is_sync():
    out = list(prefetch_iter(range(5), lambda i: i + 1, depth=0))
    assert out == [1, 2, 3, 4, 5]


def test_prefetch_propagates_errors():
    def fetch(i):
        if i == 3:
            raise ValueError("boom")
        return i

    it = prefetch_iter(range(6), fetch, depth=2)
    assert next(it) == 0
    with pytest.raises(ValueError, match="boom"):
        list(it)


def _mixed_corpus():
    """Meshes two octaves apart in size: bucketing must separate them."""
    pairs = []
    for subdiv, seed in [(1, 0), (1, 1), (3, 2), (3, 3)]:
        m_o = synth.icosphere(subdiv)
        pairs.append((synth.add_noise(m_o, 0.15, seed=seed), m_o))
    return pairs


def test_bucketize_separates_sizes_and_reduces_padding():
    ds = InMemoryDataset(_mixed_corpus(), BuildConfig(granularity=16))
    n_buckets = ds.bucketize(growth=1.5)
    assert n_buckets == 2
    assert ds.bucket_of[0] == ds.bucket_of[1] != ds.bucket_of[2] == ds.bucket_of[3]

    small = ds.get(0)  # bucket plan
    big = ds.get(2)
    merged = ds.get(0, ds.plan)  # dataset-wide plan
    n_small = small.v.x.shape[0]
    assert n_small < big.v.x.shape[0]
    assert n_small < merged.v.x.shape[0]  # over-padding removed

    # real (masked) content identical under either plan
    k = int(np.asarray(small.v.levels[0].node_mask).sum())
    np.testing.assert_array_equal(
        np.asarray(small.v.x)[:k], np.asarray(merged.v.x)[:k]
    )


def test_trainer_streaming_bucketed_converges():
    """Streaming mode (no preload) + prefetch + bucketed plans: the fused
    step recompiles per bucket and still trains to a finite, decreasing
    loss."""
    ds = InMemoryDataset(_mixed_corpus(), BuildConfig(granularity=16))
    cfg = Config(
        max_epoch=4, lr=1e-3, seed=0, augment=False, granularity=16,
        preload=False, prefetch_depth=2, buckets_growth=1.5,
    )
    tr = Trainer(cfg, ds)
    rng = np.random.default_rng(0)
    first = tr.run_epoch(rng)
    for _ in range(3):
        last = tr.run_epoch(rng)
    assert np.isfinite(last["loss"])
    assert last["loss"] < first["loss"]
