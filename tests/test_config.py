"""Config/reloption parity tests (reference: embedding.c:111-151, 214-244)."""

import pytest

from pg_embedding_tpu.config import (HnswConfig, HnswConfigError, Metric,
                                     resolve_metric)


def test_defaults_match_reference():
    # m=100, efconstruction=16, efsearch=64 (embedding.c:111-113)
    cfg = HnswConfig(dims=128)
    assert cfg.m == 100
    assert cfg.ef_construction == 16
    assert cfg.ef_search == 64
    assert cfg.metric is Metric.L2  # ann_l2_ops is the DEFAULT opclass


def test_max_m_derivation():
    # maxM = 2*M (embedding.c:224)
    assert HnswConfig(dims=8, m=16).max_m == 32
    assert HnswConfig(dims=8, m=3).max_m == 6


def test_dims_required():
    # "Number of dimensions is not specified" (embedding.c:220)
    with pytest.raises(TypeError):
        HnswConfig()  # type: ignore[call-arg]
    with pytest.raises(HnswConfigError):
        HnswConfig(dims=0)
    with pytest.raises(HnswConfigError):
        HnswConfig(dims=-4)


def test_param_ranges():
    with pytest.raises(HnswConfigError):
        HnswConfig(dims=8, m=0)
    with pytest.raises(HnswConfigError):
        HnswConfig(dims=8, ef_construction=0)
    with pytest.raises(HnswConfigError):
        HnswConfig(dims=8, ef_search=0)


def test_metric_resolution():
    # operators (embedding--0.3.6.sql:31-44) and opclasses (:57-70)
    assert resolve_metric("<->") is Metric.L2
    assert resolve_metric("<=>") is Metric.COSINE
    assert resolve_metric("<~>") is Metric.MANHATTAN
    assert resolve_metric("ann_l2_ops") is Metric.L2
    assert resolve_metric("ann_cos_ops") is Metric.COSINE
    assert resolve_metric("ann_manhattan_ops") is Metric.MANHATTAN
    assert resolve_metric("l2") is Metric.L2
    assert resolve_metric(1) is Metric.COSINE
    with pytest.raises(HnswConfigError):
        resolve_metric("nope")


def test_ef_mutation_only():
    # only ef* may change post-build (embedding.c:594-602)
    cfg = HnswConfig(dims=8, m=4)
    cfg2 = cfg.with_ef(ef_search=256, ef_construction=99)
    assert cfg2.ef_search == 256
    assert cfg2.ef_construction == 99
    assert cfg2.frozen_fields() == cfg.frozen_fields()


def test_roundtrip_dict():
    cfg = HnswConfig(dims=12, m=7, ef_construction=33, ef_search=77,
                     metric=Metric.COSINE)
    assert HnswConfig.from_dict(cfg.to_dict()) == cfg
