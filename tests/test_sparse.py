"""Sparse substrate unit tests: conv ops vs dense oracles, voxelize vs numpy."""
import jax
jax.config.update('jax_default_matmul_precision', 'highest')
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from virconv_tpu.ops import sparse as sp


def make_random_sparse(rng, batch_size=2, spatial=(8, 12, 10), n_valid=60,
                       capacity=96, channels=4):
    """Random sparse tensor with unique coords, sorted by key."""
    d, h, w = spatial
    seen = set()
    coords = []
    while len(coords) < n_valid:
        c = (rng.integers(batch_size), rng.integers(d), rng.integers(h),
             rng.integers(w))
        if c not in seen:
            seen.add(c)
            coords.append(c)
    coords = np.array(coords, dtype=np.int32)
    feats = rng.standard_normal((n_valid, channels)).astype(np.float32)
    pad = capacity - n_valid
    coords = np.concatenate([coords, -np.ones((pad, 4), np.int32)])
    feats = np.concatenate([feats, np.zeros((pad, channels), np.float32)])
    mask = np.concatenate([np.ones(n_valid, bool), np.zeros(pad, bool)])
    st = sp.SparseTensor(feats=jnp.asarray(feats), coords=jnp.asarray(coords),
                         mask=jnp.asarray(mask), spatial_shape=spatial,
                         batch_size=batch_size)
    return sp.sort_by_key(st)


def sparse_to_dense_np(st):
    d, h, w = st.spatial_shape
    out = np.zeros((st.batch_size, d, h, w, st.num_channels), np.float32)
    coords = np.asarray(st.coords)
    feats = np.asarray(st.feats)
    mask = np.asarray(st.mask)
    for i in range(len(mask)):
        if mask[i]:
            b, z, y, x = coords[i]
            out[b, z, y, x] = feats[i]
    return out


def dense_conv3d_np(dense, weights, kernel=(3, 3, 3)):
    """Oracle: dense 3D conv, SAME padding, centered kernel."""
    b, d, h, w, cin = dense.shape
    k = weights.shape[0]
    cout = weights.shape[-1]
    kd, kh, kw = kernel
    pad = ((0, 0), (kd // 2, kd // 2), (kh // 2, kh // 2),
           (kw // 2, kw // 2), (0, 0))
    dp = np.pad(dense, pad)
    out = np.zeros((b, d, h, w, cout), np.float32)
    ki = 0
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                out += dp[:, dz:dz + d, dy:dy + h, dx:dx + w, :] @ weights[ki]
                ki += 1
    return out


class TestKeysAndLookup:
    def test_sort_and_keys(self):
        rng = np.random.default_rng(0)
        st = make_random_sparse(rng)
        keys = np.asarray(st.keys())
        assert (np.diff(keys.astype(np.int64)) >= 0).all()
        nv = int(np.asarray(st.mask).sum())
        assert (keys[:nv] < sp.INVALID_KEY).all()
        assert (keys[nv:] == sp.INVALID_KEY).all()

    def test_lookup_hits_and_misses(self):
        keys = jnp.asarray([3, 7, 7, 15, sp.INVALID_KEY], dtype=jnp.int32)
        q = jnp.asarray([7, 3, 4, 15, sp.INVALID_KEY], dtype=jnp.int32)
        idx = np.asarray(sp.lookup(keys, q))
        assert idx[0] == 1   # first occurrence of duplicate
        assert idx[1] == 0
        assert idx[2] == -1
        assert idx[3] == 3
        assert idx[4] == -1  # invalid key never matches


class TestSubmConv:
    def test_matches_dense_oracle_at_valid_sites(self):
        rng = np.random.default_rng(1)
        st = make_random_sparse(rng, channels=4)
        weights = rng.standard_normal((27, 4, 6)).astype(np.float32)

        nmap = sp.build_subm_neighbor_map(st, 3)
        out = sp.gathered_conv(st.feats, nmap, jnp.asarray(weights), st.mask)

        dense = sparse_to_dense_np(st)
        oracle = dense_conv3d_np(dense, weights)
        coords = np.asarray(st.coords)
        mask = np.asarray(st.mask)
        out = np.asarray(out)
        for i in range(len(mask)):
            if mask[i]:
                b, z, y, x = coords[i]
                np.testing.assert_allclose(out[i], oracle[b, z, y, x],
                                           rtol=1e-4, atol=1e-4)
            else:
                assert np.all(out[i] == 0)

    def test_neighbor_map_reuse_is_pure_function_of_coords(self):
        rng = np.random.default_rng(2)
        st = make_random_sparse(rng)
        m1 = np.asarray(sp.build_subm_neighbor_map(st, 3))
        st2 = st.replace_feats(st.feats * 2.0)
        m2 = np.asarray(sp.build_subm_neighbor_map(st2, 3))
        np.testing.assert_array_equal(m1, m2)


class TestStridedConv:
    @pytest.mark.parametrize('stride,padding', [(2, 1), ((2, 2, 2), (0, 1, 1))])
    def test_downsample_output_set_and_values(self, stride, padding):
        rng = np.random.default_rng(3)
        spatial = (9, 10, 8)
        st = make_random_sparse(rng, spatial=spatial, n_valid=40, capacity=64)
        cin, cout = 4, 5
        weights = rng.standard_normal((27, cin, cout)).astype(np.float32)

        st_out = sp.downsample_coords(st, stride, padding, 3, out_capacity=256)
        nmap = sp.build_strided_neighbor_map(st, st_out, stride, padding, 3)
        out_feats = sp.gathered_conv(st.feats, nmap, jnp.asarray(weights),
                                     st_out.mask)

        # numpy oracle: dense strided conv
        s = stride if isinstance(stride, tuple) else (stride,) * 3
        p = padding if isinstance(padding, tuple) else (padding,) * 3
        dense = sparse_to_dense_np(st)
        dp = np.pad(dense, ((0, 0), (p[0], p[0]), (p[1], p[1]), (p[2], p[2]),
                            (0, 0)))
        out_shape = tuple((spatial[i] + 2 * p[i] - 3) // s[i] + 1
                          for i in range(3))
        oracle = np.zeros((st.batch_size,) + out_shape + (cout,), np.float32)
        occupancy = np.zeros((st.batch_size,) + out_shape, bool)
        coords_in = np.asarray(st.coords)
        mask_in = np.asarray(st.mask)
        ki = 0
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    sub = dp[:, dz::s[0], dy::s[1], dx::s[2], :]
                    sub = sub[:, :out_shape[0], :out_shape[1], :out_shape[2]]
                    oracle += sub @ weights[ki]
                    ki += 1
        # occupancy: an output site exists iff reachable from a valid input
        for i in range(len(mask_in)):
            if not mask_in[i]:
                continue
            b, z, y, x = coords_in[i]
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        oz, rz = divmod(z + p[0] - dz, s[0])
                        oy, ry = divmod(y + p[1] - dy, s[1])
                        ox, rx = divmod(x + p[2] - dx, s[2])
                        if rz == ry == rx == 0 and \
                           0 <= oz < out_shape[0] and 0 <= oy < out_shape[1] \
                           and 0 <= ox < out_shape[2]:
                            occupancy[b, oz, oy, ox] = True

        coords_out = np.asarray(st_out.coords)
        mask_out = np.asarray(st_out.mask)
        got_set = {tuple(coords_out[i]) for i in range(len(mask_out))
                   if mask_out[i]}
        want_set = {(b, z, y, x) for b, z, y, x in zip(*np.nonzero(occupancy))}
        assert got_set == want_set

        out_feats = np.asarray(out_feats)
        for i in range(len(mask_out)):
            if mask_out[i]:
                b, z, y, x = coords_out[i]
                np.testing.assert_allclose(out_feats[i], oracle[b, z, y, x],
                                           rtol=1e-4, atol=1e-4)


class TestVoxelize:
    def test_mean_and_cap_semantics(self):
        rng = np.random.default_rng(4)
        pcr = [0, -2, -1, 4, 2, 1]
        vs = [0.5, 0.5, 0.5]
        pts = rng.uniform([0, -2, -1, 0], [4, 2, 1, 1],
                          size=(200, 4)).astype(np.float32)
        # stack 10 points into one voxel to exercise the cap
        pts[:10, :3] = [0.25, 0.25, 0.25]
        mask = np.ones(200, bool)
        mask[190:] = False
        st = sp.voxelize(jnp.asarray(pts), jnp.asarray(mask), pcr, vs,
                         max_voxels=256, max_points_per_voxel=5)

        # numpy oracle
        vox = np.floor((pts[:, :3] - np.array(pcr[:3])) / np.array(vs))
        vox = vox.astype(np.int64)
        groups = {}
        for i in range(190):
            k = tuple(vox[i])
            groups.setdefault(k, []).append(i)
        coords = np.asarray(st.coords)
        feats = np.asarray(st.feats)
        vmask = np.asarray(st.mask)
        got = {tuple(coords[i][[3, 2, 1]]): feats[i]
               for i in range(len(vmask)) if vmask[i]}
        assert set(got.keys()) == set(groups.keys())
        for k, idxs in groups.items():
            capped = idxs[:5]
            np.testing.assert_allclose(got[k], pts[capped].mean(0),
                                       rtol=1e-5, atol=1e-5)

    def test_indicator_max(self):
        pts = np.array([[0.1, 0.1, 0.1, 1.0],
                        [0.11, 0.1, 0.1, 2.0],
                        [3.0, 1.0, 0.5, 5.0]], np.float32)
        st = sp.voxelize(jnp.asarray(pts), jnp.ones(3, bool),
                         [0, -2, -1, 4, 2, 1], [0.5, 0.5, 0.5],
                         max_voxels=16, max_points_per_voxel=5,
                         indicator_max=True)
        feats = np.asarray(st.feats)[np.asarray(st.mask)]
        lasts = sorted(feats[:, -1].tolist())
        assert lasts == [2.0, 5.0]

    def test_batched(self):
        pts = np.array([[0.1, 0.1, 0.1, 1.0], [0.1, 0.1, 0.1, 3.0]],
                       np.float32)
        bidx = jnp.asarray([0, 1], dtype=jnp.int32)
        st = sp.voxelize(jnp.asarray(pts), jnp.ones(2, bool),
                         [0, -2, -1, 4, 2, 1], [0.5, 0.5, 0.5],
                         max_voxels=8, max_points_per_voxel=5,
                         batch_size=2, batch_idx=bidx)
        assert int(np.asarray(st.mask).sum()) == 2
        coords = np.asarray(st.coords)[np.asarray(st.mask)]
        assert set(coords[:, 0].tolist()) == {0, 1}


class TestDense:
    def test_to_dense_roundtrip(self):
        rng = np.random.default_rng(5)
        st = make_random_sparse(rng, spatial=(4, 6, 5), n_valid=20,
                                capacity=32)
        dense = np.asarray(sp.to_dense(st))
        np.testing.assert_allclose(dense, sparse_to_dense_np(st), rtol=1e-6)
