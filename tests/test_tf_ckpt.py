"""TF-free checkpoint reader tests.

TensorFlow is absent in this image (zero egress), so the fixtures are
written by a minimal tensor-bundle WRITER implemented here directly from
the format specs (leveldb table_format.md + tensor_bundle.proto) — not by
inverting the reader's code — cross-checking the reader against the spec.
"""

import struct

import numpy as np

from object_detection_tracking_tpu.utils import tf_ckpt as T


# ---------------------------------------------------------------------------
# spec-based writer


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _pb_varint(field: int, value: int) -> bytes:
    return _varint((field << 3) | 0) + _varint(value)


def _pb_bytes(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _shape_proto(shape) -> bytes:
    out = b""
    for d in shape:
        out += _pb_bytes(2, _pb_varint(1, d))   # Dim {size=1}
    return out


def _bundle_entry(dtype_enum, shape, shard, offset, size) -> bytes:
    out = _pb_varint(1, dtype_enum)
    out += _pb_bytes(2, _shape_proto(shape))
    if shard:
        out += _pb_varint(3, shard)
    out += _pb_varint(4, offset) + _pb_varint(5, size)
    return out


def _block(entries) -> bytes:
    """leveldb block: entries with no prefix compression, one restart."""
    body = b""
    for key, value in entries:
        body += _varint(0) + _varint(len(key)) + _varint(len(value))
        body += key + value
    body += struct.pack("<I", 0)        # restart offset 0
    body += struct.pack("<I", 1)        # num_restarts
    return body


def _handle(offset, size) -> bytes:
    return _varint(offset) + _varint(size)


def write_bundle(prefix, tensors):
    """tensors: name -> np.ndarray (C-order, little-endian)."""
    data = b""
    entries = []
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        if arr.dtype == np.float32:
            enum = 1
        elif arr.dtype == np.int64:
            enum = 9
        elif arr.dtype == np.int32:
            enum = 3
        else:
            raise ValueError(arr.dtype)
        raw = arr.tobytes()
        entries.append((name.encode(),
                        _bundle_entry(enum, arr.shape, 0, len(data),
                                      len(raw))))
        data += raw
    with open(f"{prefix}.data-00000-of-00001", "wb") as f:
        f.write(data)

    header = _pb_varint(1, 1)           # BundleHeaderProto num_shards=1
    table_entries = [(b"", header)] + entries

    out = b""
    data_block = _block(table_entries)
    data_off, data_sz = len(out), len(data_block)
    out += data_block + b"\x00" + b"\x00" * 4     # type 0 + fake crc

    meta_block = _block([])
    meta_off, meta_sz = len(out), len(meta_block)
    out += meta_block + b"\x00" + b"\x00" * 4

    index_block = _block([(b"\xff", _handle(data_off, data_sz))])
    idx_off, idx_sz = len(out), len(index_block)
    out += index_block + b"\x00" + b"\x00" * 4

    footer = _handle(meta_off, meta_sz) + _handle(idx_off, idx_sz)
    footer += b"\x00" * (40 - len(footer))
    footer += struct.pack("<Q", 0xdb4775248b80fb57)
    with open(f"{prefix}.index", "wb") as f:
        f.write(out + footer)


# ---------------------------------------------------------------------------


def test_snappy_decompress_spec_vectors():
    # literal: tag (len-1)<<2 | 00
    lit = bytes([5 << 2]) + b"hello!"
    assert T.snappy_decompress(_varint(6) + lit[:1] + b"hello!") == b"hello!"
    # literal "abcd" + 1-byte-offset copy of len 4, offset 4 -> "abcdabcd"
    stream = _varint(8)
    stream += bytes([3 << 2]) + b"abcd"
    stream += bytes([(0 << 5) | ((4 - 4) << 2) | 1, 4])
    assert T.snappy_decompress(stream) == b"abcdabcd"
    # overlapping copy (run-length): "ab" + copy(offset 2, len 6)
    stream = _varint(8)
    stream += bytes([1 << 2]) + b"ab"
    stream += bytes([((6 - 4) << 2) | 1, 2])
    assert T.snappy_decompress(stream) == b"abababab"


def test_roundtrip_tensors(tmp_path):
    prefix = str(tmp_path / "model.ckpt")
    rng = np.random.RandomState(0)
    tensors = {
        "conv0/W": rng.randn(3, 3, 3, 8).astype(np.float32),
        "group0/block0/conv1/bn/mean/EMA": rng.randn(8).astype(np.float32),
        "global_step": np.array(1234, np.int64),
        "scalar": np.array(7, np.int32),
    }
    write_bundle(prefix, tensors)

    listing = T.list_tf_checkpoint(prefix)
    assert listing["conv0/W"][0] == (3, 3, 3, 8)
    loaded = T.load_tf_checkpoint(prefix)
    assert set(loaded) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(loaded[k], tensors[k])


def test_directory_and_index_path_resolution(tmp_path):
    prefix = str(tmp_path / "model.ckpt-5000")
    write_bundle(prefix, {"x": np.arange(6, dtype=np.float32)})
    (tmp_path / "checkpoint").write_text(
        'model_checkpoint_path: "model.ckpt-5000"\n')
    for path in (str(tmp_path), prefix, prefix + ".index"):
        loaded = T.load_tf_checkpoint(path)
        np.testing.assert_array_equal(loaded["x"],
                                      np.arange(6, dtype=np.float32))


def test_load_weights_dispatches_tf_ckpt(tmp_path):
    """End-to-end: a TF-named V2 checkpoint loads into the tiny model via
    load_weights (ref initialize, models.py:3489-3595)."""
    import jax
    from object_detection_tracking_tpu.config import DetectorConfig
    from object_detection_tracking_tpu.models import get_model
    from object_detection_tracking_tpu.utils import weights as W
    from tests.test_weights import _to_tf_names

    cfg = DetectorConfig(
        num_class=4, resnet_depth=18, short_edge_size=64, max_size=128,
        rpn_test_post_nms_topk=16, result_per_im=5, compute_dtype="float32")
    m = get_model(cfg)
    params = jax.tree.map(np.asarray, m.init_params(jax.random.PRNGKey(7)))
    tf_named = {k[:-2]: v for k, v in _to_tf_names(params).items()}
    # store fc6 in the reference's C-major row order
    fc6 = tf_named["fastrcnn/fc6/W"]
    d = fc6.shape[1]
    c = cfg.fpn_num_channel
    tf_named["fastrcnn/fc6/W"] = fc6.reshape(7, 7, c, d).transpose(
        2, 0, 1, 3).reshape(-1, d)
    tf_named["global_step"] = np.array(99, np.int64)

    prefix = str(tmp_path / "model.ckpt-99")
    write_bundle(prefix, tf_named)
    loaded = W.load_weights(prefix, m)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(loaded)):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
