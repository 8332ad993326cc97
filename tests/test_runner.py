"""DetectionRunner pipeline: ordering, packing roundtrip, mask mode."""

import numpy as np
import jax.numpy as jnp

from object_detection_tracking_tpu.runtime.runner import DetectionRunner


class FakeConfig:
    add_mask = False


class FakeModel:
    """Deterministic 'detector': encodes the batch mean into outputs."""

    config = FakeConfig()

    def forward(self, params, images):
        b = images.shape[0]
        r, c = 4, 8
        val = images.reshape(b, -1).mean(axis=1).astype(jnp.float32)
        boxes = jnp.tile(val[:, None, None], (1, r, 4))
        labels = jnp.ones((b, r), jnp.int32)
        probs = jnp.tile(val[:, None] / 255.0, (1, r))
        valid = jnp.ones((b, r), bool)
        grid = jnp.arange(7 * 7, dtype=jnp.float32).reshape(1, 1, 7, 7, 1)
        full = jnp.broadcast_to(grid, (b, r, 7, 7, c)) + \
            val[:, None, None, None, None]
        return {
            "final_boxes": boxes,
            "final_labels": labels,
            "final_probs": probs,
            "final_valid": valid,
            "pooled_box_feat": full.mean(axis=(2, 3)),
            "fpn_box_feat": full,
        }


def test_runner_order_and_roundtrip():
    model = FakeModel()
    runner = DetectionRunner(model, params={}, depth=2)
    rng = np.random.RandomState(0)
    batches = [(rng.randint(0, 255, (2, 8, 8, 3)).astype(np.uint8), i)
               for i in range(7)]
    metas = []
    for host, meta in runner.run(iter(batches)):
        metas.append(meta)
        want = batches[meta][0].reshape(2, -1).mean(axis=1)
        np.testing.assert_allclose(host["final_boxes"][:, 0, 0], want,
                                   rtol=1e-5)
        assert host["final_labels"].dtype == np.int32
        assert host["final_valid"].dtype == bool
        assert host["pooled_box_feat"].shape == (2, 4, 8)
    assert metas == list(range(7))  # order preserved through the pipeline


def test_temporal_delta_roundtrip_exact_with_wraparound():
    """Host uint8-wraparound diffs + device mod-256 cumsum must be
    bit-exact, including values that wrap past 0/255."""
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (8, 6, 7), np.uint8)
    frames[3] = 255; frames[4] = 0  # forced wrap
    enc = DetectionRunner.encode_delta(frames)
    dec = (jnp.cumsum(jnp.asarray(enc).astype(jnp.uint32), axis=0)
           % 256).astype(jnp.uint8)
    np.testing.assert_array_equal(np.asarray(dec), frames)


def test_runner_emb_agg_modes():
    """emb_agg: average (7x7 mean, default), max, spatial (channel-mean
    49-d) — reference tmot CLI :512-525."""
    model = FakeModel()
    batch = [(np.zeros((1, 8, 8, 3), np.uint8), 0)]
    grid = np.arange(49, dtype=np.float32)
    (h, _), = DetectionRunner(model, {}).run(iter(batch))
    np.testing.assert_allclose(h["pooled_box_feat"][0, 0],
                               np.full(8, grid.mean()), atol=0.01)
    (h, _), = DetectionRunner(model, {}, emb_agg="max").run(iter(batch))
    np.testing.assert_allclose(h["pooled_box_feat"][0, 0],
                               np.full(8, 48.0), atol=0.25)
    (h, _), = DetectionRunner(model, {}, emb_agg="spatial").run(iter(batch))
    assert h["pooled_box_feat"].shape == (1, 4, 49)
    np.testing.assert_allclose(h["pooled_box_feat"][0, 0], grid, atol=0.25)


def test_runner_delta_matches_nodelta():
    model = FakeModel()
    rng = np.random.RandomState(2)
    batches = [(rng.randint(0, 256, (4, 8, 8, 3)).astype(np.uint8), i)
               for i in range(3)]
    out_d = [h["final_boxes"] for h, _ in DetectionRunner(
        model, {}, temporal_delta=True).run(iter(batches))]
    out_n = [h["final_boxes"] for h, _ in DetectionRunner(
        model, {}, temporal_delta=False).run(iter(batches))]
    for a, b in zip(out_d, out_n):
        np.testing.assert_array_equal(a, b)


def test_runner_sharded_mesh_matches_single(tmp_path):
    """mesh-sharded runner == single-device runner on the real detector
    (tiny shapes, 8-device virtual CPU mesh)."""
    import jax
    from object_detection_tracking_tpu.config import DetectorConfig
    from object_detection_tracking_tpu.models import get_model
    from object_detection_tracking_tpu.parallel import make_mesh

    cfg = DetectorConfig(
        num_class=4, resnet_depth=18, short_edge_size=48, max_size=64,
        rpn_test_post_nms_topk=32, result_per_im=5,
        compute_dtype="float32", roi_align_impl="xla")
    model = get_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batches = [(rng.randint(0, 255, (8, 48, 64, 3)).astype(np.uint8), i)
               for i in range(2)]
    single = [h for h, _ in DetectionRunner(
        model, params).run(iter(batches))]
    mesh = make_mesh(n_data=8, n_model=1)
    sharded = [h for h, _ in DetectionRunner(
        model, params, mesh=mesh).run(iter(batches))]
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a["final_boxes"], b["final_boxes"],
                                   atol=1e-3)
        np.testing.assert_array_equal(a["final_labels"], b["final_labels"])


def test_runner_empty_iterator():
    runner = DetectionRunner(FakeModel(), params={}, depth=2)
    assert list(runner.run(iter([]))) == []


def test_runner_mask_mode_unpack():
    class MaskConfig:
        add_mask = True

    class MaskModel(FakeModel):
        config = MaskConfig()

        def forward(self, params, images):
            out = super().forward(params, images)
            b = images.shape[0]
            out["final_masks"] = jnp.full((b, 4, 28, 28), 0.75)
            return out

    runner = DetectionRunner(MaskModel(), params={}, depth=1)
    batches = [(np.zeros((1, 8, 8, 3), np.uint8), 0)]
    (host, meta), = list(runner.run(iter(batches)))
    assert host["final_masks"].shape == (1, 4, 28, 28)
    np.testing.assert_allclose(host["final_masks"], 0.75)
    assert host["pooled_box_feat"].shape == (1, 4, 8)


def test_runner_cross_batch_carry_across_run_calls():
    """The cross-batch delta carry persists across run() invocations:
    host mirror and device carry must stay in sync so later batches
    still reconstruct bit-exactly."""
    model = FakeModel()
    rng = np.random.RandomState(3)
    runner = DetectionRunner(model, {}, temporal_delta=True)
    assert runner.cross_batch_delta
    ref = DetectionRunner(model, {}, temporal_delta=False)
    batches = [(rng.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8), i)
               for i in range(4)]
    for call in (batches[:2], batches[2:]):  # two separate run() calls
        got = [h["final_boxes"] for h, _ in runner.run(iter(call))]
        want = [h["final_boxes"] for h, _ in ref.run(iter(call))]
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)


def test_runner_ship_full_feat_roundtrip():
    """ship_full_feat packs the full [R,7,7,C] ROI features (bf16) into
    the single readback (--get_box_feat mode)."""
    model = FakeModel()
    model.config.fpn_num_channel = 8
    runner = DetectionRunner(model, {}, ship_full_feat=True)
    batch = [(np.zeros((2, 8, 8, 3), np.uint8), 0)]
    (h, _), = runner.run(iter(batch))
    assert h["fpn_box_feat"].shape == (2, 4, 7, 7, 8)
    grid = np.arange(49, dtype=np.float32).reshape(7, 7)
    np.testing.assert_allclose(h["fpn_box_feat"][0, 0, :, :, 0], grid,
                               atol=0.25)  # bf16 rounding
    # pooled feats still intact alongside
    np.testing.assert_allclose(h["pooled_box_feat"][0, 0],
                               np.full(8, grid.mean()), atol=0.05)
    del model.config.fpn_num_channel


def test_runner_carry_resets_on_resolution_change():
    """One runner serves every video in a --video_lst_file; a later video
    with a different resolution must reset the cross-batch carry instead
    of raising a broadcast error, and still reconstruct bit-exactly."""
    model = FakeModel()
    rng = np.random.RandomState(7)
    runner = DetectionRunner(model, {}, temporal_delta=True)
    ref = DetectionRunner(model, {}, temporal_delta=False)
    small = [(rng.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8), i)
             for i in range(2)]
    big = [(rng.randint(0, 256, (2, 16, 8, 3)).astype(np.uint8), i)
           for i in range(2)]
    for call in (small, big, small):  # shape changes both ways
        got = [h["final_boxes"] for h, _ in runner.run(iter(call))]
        want = [h["final_boxes"] for h, _ in ref.run(iter(call))]
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)


def test_runner_carry_resets_after_abandoned_stream():
    """Abandoning run() mid-stream must reset the cross-batch carry so a
    later run() reconstructs bit-exactly again."""
    model = FakeModel()
    rng = np.random.RandomState(5)
    runner = DetectionRunner(model, {}, temporal_delta=True)
    ref = DetectionRunner(model, {}, temporal_delta=False)
    batches = [(rng.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8), i)
               for i in range(4)]
    gen = runner.run(iter(batches))
    next(gen)
    gen.close()  # abandon with batches still in flight
    got = [h["final_boxes"] for h, _ in runner.run(iter(batches))]
    want = [h["final_boxes"] for h, _ in ref.run(iter(batches))]
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
