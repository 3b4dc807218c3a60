"""Unit tests for the fixed-shape map machinery (state ops, keyframe
filtering, local-map merging)."""

import jax
import jax.numpy as jnp
import numpy as np

from alvaar_tpu.config import SlamConfig
from alvaar_tpu.geom import SE3, Camera
from alvaar_tpu.worldmap.keyframe import filter_redundant_keyframes
from alvaar_tpu.worldmap.matching import match_to_local_map
from alvaar_tpu.worldmap.state import (
    allocate_slots,
    covisibility,
    init_map_state,
    masked_scatter_set,
)

CFG = SlamConfig(width=320, height=240, cell_size=40, window_size=6,
                 max_landmarks=64)
CAM = Camera.from_fov(320, 240, 60.0)


class TestStateOps:
    def test_allocate_slots_distinct_and_free(self):
        valid = jnp.asarray([True, False, True, False, False, True])
        want = jnp.asarray([True, True, True, False])
        idx, granted = allocate_slots(valid, want)
        idx, granted = np.asarray(idx), np.asarray(granted)
        assert granted[:3].all() and not granted[3]
        taken = idx[granted]
        assert len(set(taken.tolist())) == 3
        assert not valid[taken].any()

    def test_allocate_exhausted_pool(self):
        valid = jnp.asarray([True, True, True, False])
        want = jnp.ones(3, bool)
        idx, granted = allocate_slots(valid, want)
        assert int(granted.sum()) == 1  # only one free slot

    def test_masked_scatter_no_collision(self):
        arr = jnp.zeros(5)
        # stale duplicate index in a masked-out row must not clobber
        idx = jnp.asarray([2, 2, 4])
        vals = jnp.asarray([7.0, 99.0, 3.0])
        mask = jnp.asarray([True, False, True])
        out = masked_scatter_set(arr, idx, vals, mask)
        np.testing.assert_array_equal(out, [0, 0, 7.0, 0, 3.0])

    def test_covisibility_matmul(self):
        st = init_map_state(CFG)
        lm_obs = st.lm_obs.at[0, 0].set(True).at[0, 1].set(True) \
                          .at[1, 1].set(True).at[1, 2].set(True)
        st = st._replace(
            lm_obs=lm_obs,
            lm_valid=st.lm_valid.at[:2].set(True),
            lm_is3d=st.lm_is3d.at[:2].set(True),
            kf_valid=st.kf_valid.at[:3].set(True))
        cov = np.asarray(covisibility(st))
        assert cov[0, 1] == 1 and cov[1, 2] == 1 and cov[0, 2] == 0
        assert cov[1, 1] == 2


def _crafted_state(n_kf=6, n_lm=20):
    """A state with n_kf live keyframes all observing the first n_lm 3D
    landmarks (maximally redundant)."""
    st = init_map_state(CFG)
    K = CFG.max_keypoints
    kf_valid = st.kf_valid.at[:n_kf].set(True)
    kf_id = st.kf_id.at[:n_kf].set(jnp.arange(n_kf, dtype=jnp.int32))
    lm_valid = st.lm_valid.at[:n_lm].set(True)
    lm_is3d = st.lm_is3d.at[:n_lm].set(True)
    lm_obs = st.lm_obs.at[:n_lm, :n_kf].set(True)
    obs_lm = st.kf_obs_lm.at[:n_kf, :n_lm].set(
        jnp.broadcast_to(jnp.arange(n_lm, dtype=jnp.int32), (n_kf, n_lm)))
    obs_valid = st.kf_obs_valid.at[:n_kf, :n_lm].set(True)
    return st._replace(
        kf_valid=kf_valid, kf_id=kf_id, lm_valid=lm_valid, lm_is3d=lm_is3d,
        lm_obs=lm_obs, kf_obs_lm=obs_lm, kf_obs_valid=obs_valid,
        cur_kf_slot=jnp.asarray(n_kf - 1, jnp.int32),
        next_kf_id=jnp.asarray(25, jnp.int32))  # past the >=20 gate


class TestKeyframeFilter:
    def test_removes_redundant(self):
        st = _crafted_state()
        out = filter_redundant_keyframes(st, CFG)
        kept = np.asarray(out.kf_valid)
        # newest (slot 5) and keyframe 0 survive; redundant middles die
        assert kept[5] and kept[0]
        assert not kept[1:5].any()

    def test_keeps_when_not_redundant(self):
        st = _crafted_state(n_kf=3)  # only 3 observers → n_obs <= 4
        out = filter_redundant_keyframes(st, CFG)
        np.testing.assert_array_equal(out.kf_valid, st.kf_valid)

    def test_disabled_by_ratio_one(self):
        import dataclasses
        cfg = dataclasses.replace(CFG, kf_filtering_ratio=1.0)
        st = _crafted_state()
        out = filter_redundant_keyframes(st, cfg)
        np.testing.assert_array_equal(out.kf_valid, st.kf_valid)


class TestLocalMapMatching:
    def test_merges_duplicate_landmark(self, rng):
        """An established 3D landmark projecting onto a young keypoint with
        an identical descriptor must absorb the young landmark."""
        st = init_map_state(CFG)
        slot = 2
        # established landmark 0: 3D at a point in front of the camera,
        # observed by keyframes 0 and 1 only
        pos = jnp.asarray([0.2, -0.1, 5.0])
        desc = jnp.asarray(rng.integers(0, 2**32, (8,), dtype=np.uint32))
        st = st._replace(
            kf_valid=st.kf_valid.at[:3].set(True),
            kf_id=st.kf_id.at[:3].set(jnp.arange(3, dtype=jnp.int32)),
            cur_kf_slot=jnp.asarray(slot, jnp.int32),
            next_kf_id=jnp.asarray(3, jnp.int32),
            lm_valid=st.lm_valid.at[0].set(True).at[1].set(True),
            lm_is3d=st.lm_is3d.at[0].set(True).at[1].set(True),
            lm_pos=st.lm_pos.at[0].set(pos).at[1].set(pos + 0.01),
            lm_desc=st.lm_desc.at[0].set(desc).at[1].set(desc),
            # matching is bag-aware (min cross-bag): seed both bags
            lm_desc_bag=st.lm_desc_bag.at[0, 0].set(desc).at[1, 0].set(desc),
            lm_desc_cnt=st.lm_desc_cnt.at[0].set(1).at[1].set(1),
            lm_obs=st.lm_obs.at[0, 0].set(True).at[0, 1].set(True)
                            .at[1, slot].set(True),
        )
        # young landmark 1 bound at keypoint slot 3, observed by the new kf
        px = CAM.project_dist(pos)
        st = st._replace(
            kp_valid=st.kp_valid.at[3].set(True),
            kp_lm=st.kp_lm.at[3].set(1),
            kp_px=st.kp_px.at[3].set(px),
            kp_und=st.kp_und.at[3].set(px),
            kf_obs_lm=st.kf_obs_lm.at[slot, 3].set(1),
            kf_obs_px=st.kf_obs_px.at[slot, 3].set(px),
            kf_obs_valid=st.kf_obs_valid.at[slot, 3].set(True),
        )
        out = match_to_local_map(st, CAM, CFG)
        assert int(out.kp_lm[3]) == 0          # rebound to the old landmark
        assert not bool(out.lm_valid[1])       # young landmark died
        assert bool(out.lm_obs[0, slot])       # old landmark observed by new kf
        assert int(out.kf_obs_lm[slot, 3]) == 0

    def test_no_merge_when_co_observed(self, rng):
        """Landmarks sharing an observer keyframe must not merge."""
        st = init_map_state(CFG)
        slot = 2
        pos = jnp.asarray([0.2, -0.1, 5.0])
        desc = jnp.asarray(rng.integers(0, 2**32, (8,), dtype=np.uint32))
        px = CAM.project_dist(pos)
        st = st._replace(
            kf_valid=st.kf_valid.at[:3].set(True),
            kf_id=st.kf_id.at[:3].set(jnp.arange(3, dtype=jnp.int32)),
            cur_kf_slot=jnp.asarray(slot, jnp.int32),
            next_kf_id=jnp.asarray(3, jnp.int32),
            lm_valid=st.lm_valid.at[0].set(True).at[1].set(True),
            lm_is3d=st.lm_is3d.at[0].set(True).at[1].set(True),
            lm_pos=st.lm_pos.at[0].set(pos).at[1].set(pos + 0.01),
            lm_desc=st.lm_desc.at[0].set(desc).at[1].set(desc),
            lm_desc_bag=st.lm_desc_bag.at[0, 0].set(desc).at[1, 0].set(desc),
            lm_desc_cnt=st.lm_desc_cnt.at[0].set(1).at[1].set(1),
            # BOTH observed by keyframe 1 → not merge candidates
            lm_obs=st.lm_obs.at[0, 1].set(True).at[1, 1].set(True)
                            .at[1, slot].set(True),
            kp_valid=st.kp_valid.at[3].set(True),
            kp_lm=st.kp_lm.at[3].set(1),
            kp_px=st.kp_px.at[3].set(px),
            kp_und=st.kp_und.at[3].set(px),
            kf_obs_lm=st.kf_obs_lm.at[slot, 3].set(1),
            kf_obs_px=st.kf_obs_px.at[slot, 3].set(px),
            kf_obs_valid=st.kf_obs_valid.at[slot, 3].set(True),
        )
        out = match_to_local_map(st, CAM, CFG)
        assert int(out.kp_lm[3]) == 1
        assert bool(out.lm_valid[1])
