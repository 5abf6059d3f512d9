"""Pallas kernel correctness tests (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deep_cartograph_tpu.ops.pallas_kernels import (
    kde_logsumexp,
    pairwise_distance_matrix,
)


def test_pairwise_distance_matrix_matches_numpy(rng):
    coords = rng.standard_normal((3, 50, 3)).astype(np.float32) * 5
    out = np.asarray(pairwise_distance_matrix(coords, tile=128))
    assert out.shape == (3, 50, 50)
    for f in range(3):
        diff = coords[f][:, None, :] - coords[f][None, :, :]
        expected = np.sqrt((diff**2).sum(-1))
        np.testing.assert_allclose(out[f], expected, atol=6e-3)


def test_pairwise_distance_matrix_large_tiles(rng):
    coords = rng.standard_normal((1, 300, 3)).astype(np.float32) * 5
    out = np.asarray(pairwise_distance_matrix(coords, tile=128))
    diff = coords[0][:, None, :] - coords[0][None, :, :]
    expected = np.sqrt((diff**2).sum(-1))
    np.testing.assert_allclose(out[0], expected, atol=6e-3)


def test_kde_logsumexp_matches_dense(rng):
    samples = rng.standard_normal((700, 2)).astype(np.float32)
    grid = rng.standard_normal((120, 2)).astype(np.float32)
    bw = 0.3
    inv_two_bw2 = 1.0 / (2 * bw * bw)
    out = np.asarray(kde_logsumexp(grid, samples, inv_two_bw2, tile=128,
                                   sample_block=256))
    # dense reference
    d2 = ((grid[:, None, :] - samples[None, :, :]) ** 2).sum(-1)
    from scipy.special import logsumexp

    expected = logsumexp(-d2 * inv_two_bw2, axis=1)
    np.testing.assert_allclose(out, expected, atol=1e-3)


def test_selector_pair_distances_kernel(rng):
    from deep_cartograph_tpu.ops.pallas_kernels import selector_pair_distances

    F, A = 512, 16
    ii, jj = np.triu_indices(A, k=2)
    P = len(ii)
    Ppad = 128 * ((P + 127) // 128)
    sel = np.zeros((A, Ppad), np.float32)
    sel[ii, np.arange(P)] += 1
    sel[jj, np.arange(P)] -= 1
    coords = (rng.standard_normal((F, A, 3)) * 10 + 30).astype(np.float32)

    out = np.asarray(
        selector_pair_distances(
            jnp.asarray(coords), jnp.asarray(sel), tile_f=256, tile_p=128
        )
    )[:, :P]
    truth = np.linalg.norm(coords[:, ii] - coords[:, jj], axis=-1) * 0.1
    np.testing.assert_allclose(out, truth, atol=1e-5)


def test_kde_padding_rows_contribute_nothing(rng):
    """Padded sample rows must have exactly zero density everywhere — a
    finite pad sentinel leaked density into grid points near its scaled
    coordinate (round-3 review finding)."""
    import numpy as np

    from deep_cartograph_tpu.ops.pallas_kernels import kde_logsumexp

    # n deliberately NOT a multiple of sample_block -> padding present;
    # grid values near the old 1e4 scaled sentinel would have picked up
    # spurious density.
    bw = 0.05
    inv_two_bw2 = 1.0 / (2 * bw * bw)
    scale = np.sqrt(inv_two_bw2)
    samples = rng.normal(700.0, 0.2, (100, 1)).astype(np.float32)
    assert abs(samples.mean() * scale - 1e4) < 2e3  # near old sentinel
    grid = np.linspace(699, 701, 64).reshape(-1, 1).astype(np.float32)
    got = np.asarray(
        kde_logsumexp(grid, samples, inv_two_bw2, sample_block=128)
    )
    # dense reference (float64; the device computes in f32 on ~1e4-scaled
    # coordinates, so tolerate rounding — the old sentinel bug was off by
    # ORDERS of magnitude, not 1e-2)
    d2 = ((grid[:, None, 0] - samples[None, :, 0]) * scale) ** 2
    expect = np.log(np.sum(np.exp(-d2 + d2.min(1, keepdims=True)), 1)) - \
        d2.min(1)
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=0.05)
