"""Hex tiling invariants: pack/unpack roundtrip, disk counts, binning ranges."""

import numpy as np
import jax.numpy as jnp

from fl_slam_tpu.core import hexgrid


def test_pack_unpack_roundtrip(rng):
    q = jnp.asarray(rng.integers(-1000, 1000, size=128), dtype=jnp.int32)
    r = jnp.asarray(rng.integers(-1000, 1000, size=128), dtype=jnp.int32)
    z = jnp.asarray(rng.integers(-50, 50, size=128), dtype=jnp.int32)
    key = hexgrid.pack_tile_key(q, r, z)
    q2, r2, z2 = hexgrid.unpack_tile_key(key)
    np.testing.assert_array_equal(np.asarray(q2), np.asarray(q))
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r))
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(z))


def test_hex_disk_counts():
    assert len(hexgrid.hex_disk_offsets(0)) == 1
    assert len(hexgrid.hex_disk_offsets(1)) == 7
    assert len(hexgrid.hex_disk_offsets(2)) == 19
    # all offsets unique
    offs = hexgrid.hex_disk_offsets(2)
    assert len({tuple(o) for o in offs}) == 19


def test_stencil_3d_counts():
    assert hexgrid.stencil_offsets_3d(1, 0).shape == (7, 3)
    assert hexgrid.stencil_offsets_3d(1, 1).shape == (21, 3)


def test_axial_round_origin():
    q, r = hexgrid.axial_round(jnp.asarray(0.01), jnp.asarray(-0.02))
    assert int(q) == 0 and int(r) == 0


def test_nearby_points_same_tile(rng):
    """Points within a small ball map to at most a couple of adjacent tiles."""
    center = np.array([5.0, -3.0, 0.4])
    pts = jnp.asarray(center + rng.normal(size=(256, 3)) * 0.05)
    keys = np.asarray(hexgrid.tile_keys_from_xyz(pts, h_tile=2.0))
    assert len(np.unique(keys)) <= 4


def test_far_points_different_tiles():
    pts = jnp.asarray([[0.0, 0.0, 0.0], [100.0, 100.0, 0.0]])
    keys = np.asarray(hexgrid.tile_keys_from_xyz(pts, h_tile=2.0))
    assert keys[0] != keys[1]


def test_bin_cell_ids_range(rng):
    pts = jnp.asarray(rng.normal(size=(1024, 3)) * 30)
    ids = np.asarray(hexgrid.bin_cell_ids(pts, 0.5, 8, 8, 4))
    assert ids.min() >= 0 and ids.max() < 8 * 8 * 4


def test_stencil_tile_keys_shape():
    offs = hexgrid.stencil_offsets_3d(1, 0)
    q = jnp.asarray([0, 5], dtype=jnp.int32)
    r = jnp.asarray([0, -2], dtype=jnp.int32)
    z = jnp.asarray([0, 1], dtype=jnp.int32)
    keys = hexgrid.stencil_tile_keys(q, r, z, offs)
    assert keys.shape == (2, 7)
    # center key must be in each stencil
    center = np.asarray(hexgrid.pack_tile_key(q, r, z))
    assert center[0] in np.asarray(keys[0])
    assert center[1] in np.asarray(keys[1])
