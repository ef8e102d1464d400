"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Covers parallel/mesh.py (row sharding of the frame) and parallel/halo.py
(explicit ppermute halo exchange for the bounded-stencil resampling
gathers, SURVEY.md §2.4)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from raytracer2_tpu.parallel.halo import exchange_row_halos, gather_rows
from raytracer2_tpu.parallel.mesh import ROW_AXIS, make_mesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    return make_mesh()


class TestHaloExchange:
    def _reference_pad(self, img, radius):
        top = img[:radius][::-1]
        bottom = img[-radius:][::-1]
        return np.concatenate([top, img, bottom], axis=0)

    @pytest.mark.parametrize("radius", [1, 3])
    def test_halos_match_global_reflection(self, mesh, radius):
        n = len(mesh.devices.flat)
        h, w = 8 * n, 16
        img = jnp.asarray(
            np.random.default_rng(0).normal(size=(h, w)), jnp.float32)

        @partial(shard_map, mesh=mesh, in_specs=P(ROW_AXIS),
                 out_specs=P(ROW_AXIS))
        def padded_identity(tile):
            padded = exchange_row_halos(tile, radius)
            return padded[radius:-radius]  # interior unchanged

        np.testing.assert_array_equal(np.asarray(padded_identity(img)),
                                      np.asarray(img))

    @pytest.mark.parametrize("dy,dx", [(-3, 0), (3, 2), (0, -5), (2, 1)])
    def test_stencil_gather_matches_unsharded(self, mesh, dy, dx):
        radius = 3
        n = len(mesh.devices.flat)
        h, w = 8 * n, 16
        img = jnp.asarray(
            np.random.default_rng(1).normal(size=(h, w)), jnp.float32)

        @partial(shard_map, mesh=mesh, in_specs=P(ROW_AXIS),
                 out_specs=P(ROW_AXIS))
        def sharded_gather(tile):
            padded = exchange_row_halos(tile, radius)
            return gather_rows(padded, radius, jnp.int32(dy), jnp.int32(dx))

        # unsharded oracle: same reflected-rows / clamped-columns semantics
        ref_img = self._reference_pad(np.asarray(img), radius)
        ys = np.arange(h)[:, None] + radius + dy
        xs = np.clip(np.arange(w)[None, :] + dx, 0, w - 1)
        expected = ref_img[ys, xs]

        np.testing.assert_array_equal(np.asarray(sharded_gather(img)),
                                      expected)

    def test_single_shard_reflects(self):
        img = jnp.arange(24, dtype=jnp.float32).reshape(6, 4)
        mesh1 = Mesh(np.asarray(jax.devices()[:1]), (ROW_AXIS,))

        @partial(shard_map, mesh=mesh1, in_specs=P(ROW_AXIS),
                 out_specs=P(ROW_AXIS))
        def padded(tile):
            return exchange_row_halos(tile, 2)

        got = np.asarray(padded(img))
        np.testing.assert_array_equal(got[:2], np.asarray(img[:2][::-1]))
        np.testing.assert_array_equal(got[-2:], np.asarray(img[-2:][::-1]))
