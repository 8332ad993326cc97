"""ReID model parity: our JAX forwards vs the reference's vendored torch
models (random weights, eval mode). Runs torch on CPU; exactness ~1e-4."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax.numpy as jnp

from object_detection_tracking_tpu.models.reid import (osnet_forward,
                                                       resnet_reid_forward)
from object_detection_tracking_tpu.models.reid.extractor import (
    load_torch_state_dict)


def _to_jax_params(state_dict_path):
    return {k: jnp.asarray(v)
            for k, v in load_torch_state_dict(state_dict_path).items()}


def test_osnet_parity(tmp_path):
    from torchreid.models.osnet import osnet_x1_0
    torch.manual_seed(0)
    net = osnet_x1_0(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 256, 128)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "osnet.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(osnet_forward(
        _to_jax_params(p), jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_resnet50_reid_parity(tmp_path):
    from torchreid.models.resnet import resnet50
    torch.manual_seed(1)
    net = resnet50(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 256, 128)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "r50.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(resnet_reid_forward(
        _to_jax_params(p), jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
        "resnet50"))
    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_resnet50_fc512_parity(tmp_path):
    from torchreid.models.resnet import resnet50_fc512
    torch.manual_seed(3)
    net = resnet50_fc512(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 256, 128)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "r50fc.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(resnet_reid_forward(
        _to_jax_params(p), jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
        "resnet50_fc512"))
    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_mobilenetv2_parity(tmp_path):
    from torchreid.models.mobilenetv2 import mobilenetv2_x1_0
    from object_detection_tracking_tpu.models.reid.mobilenetv2 import (
        mobilenetv2_forward)
    torch.manual_seed(4)
    net = mobilenetv2_x1_0(num_classes=10, loss="softmax",
                           pretrained=False).eval()
    x = torch.randn(2, 3, 256, 128)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "mnv2.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(mobilenetv2_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 1280)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_osnet_width_variant_parity(tmp_path):
    """osnet_x0_5 through the same forward (widths from the ckpt)."""
    from torchreid.models.osnet import osnet_x0_5
    torch.manual_seed(5)
    net = osnet_x0_5(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 256, 128)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "osnet05.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(osnet_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_feature_extractor_end_to_end(tmp_path):
    from torchreid.models.osnet import osnet_x1_0
    from object_detection_tracking_tpu.models.reid import FeatureExtractor
    torch.manual_seed(2)
    net = osnet_x1_0(num_classes=10, pretrained=False).eval()
    p = str(tmp_path / "osnet2.pth")
    torch.save(net.state_dict(), p)
    ex = FeatureExtractor("osnet_x1_0", p, max_batch=4,
                          compute_dtype="float32")
    rng = np.random.RandomState(0)
    crops = [rng.randint(0, 255, (60 + i, 30 + i, 3), np.uint8)
             for i in range(6)]  # varied sizes, > max_batch chunks
    feats = ex(crops)
    assert feats.shape == (6, 512)
    assert np.isfinite(feats).all()
    # deterministic
    feats2 = ex(crops)
    np.testing.assert_allclose(feats, feats2, atol=1e-6)


def test_osnet_ain_parity(tmp_path):
    from torchreid.models.osnet_ain import osnet_ain_x1_0
    from object_detection_tracking_tpu.models.reid import osnet_ain_forward
    torch.manual_seed(6)
    net = osnet_ain_x1_0(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 256, 128)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "osnet_ain.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(osnet_ain_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.mark.parametrize("name,dim", [
    ("resnet18", 512),          # BasicBlock path
    ("resnext50_32x4d", 2048),  # grouped 3x3 convs
])
def test_resnet_family_parity(tmp_path, name, dim):
    import torchreid.models.resnet as ref
    torch.manual_seed(7)
    net = getattr(ref, name)(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 128, 64)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / f"{name}.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(resnet_reid_forward(
        _to_jax_params(p), jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
        name))
    assert got.shape == want.shape == (2, dim)
    np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.mark.parametrize("name,dim", [
    ("se_resnet50_fc512", 512),    # SE + caffe conv1-stride + fc head
    ("se_resnext50_32x4d", 2048),  # SE + grouped conv2-stride
])
def test_senet_family_parity(tmp_path, name, dim):
    import torchreid.models.senet as ref
    from object_detection_tracking_tpu.models.reid import senet_reid_forward
    torch.manual_seed(8)
    net = getattr(ref, name)(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 128, 64)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / f"{name}.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(senet_reid_forward(
        _to_jax_params(p), jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
        name))
    assert got.shape == want.shape == (2, dim)
    np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.mark.parametrize("name", ["resnet50_ibn_a", "resnet50_ibn_b"])
def test_ibn_family_parity(tmp_path, name):
    from object_detection_tracking_tpu.models.reid import ibn_reid_forward
    if name == "resnet50_ibn_a":
        from torchreid.models.resnet_ibn_a import resnet50_ibn_a as ctor
    else:
        from torchreid.models.resnet_ibn_b import resnet50_ibn_b as ctor
    torch.manual_seed(9)
    net = ctor(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 128, 64)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / f"{name}.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(ibn_reid_forward(
        _to_jax_params(p), jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
        name))
    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_densenet_parity(tmp_path):
    from torchreid.models.densenet import densenet121
    from object_detection_tracking_tpu.models.reid import (
        densenet_reid_forward)
    torch.manual_seed(10)
    net = densenet121(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 128, 64)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "d121.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(densenet_reid_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 1024)
    # random-init densenet features reach ~1e6, so tolerance is relative
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("name", ["squeezenet1_0", "squeezenet1_1"])
def test_squeezenet_parity(tmp_path, name):
    import torchreid.models.squeezenet as ref
    from object_detection_tracking_tpu.models.reid import (
        squeezenet_reid_forward)
    torch.manual_seed(11)
    net = getattr(ref, name)(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 128, 64)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / f"{name}.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(squeezenet_reid_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_shufflenetv2_parity(tmp_path):
    from torchreid.models.shufflenetv2 import shufflenet_v2_x0_5
    from object_detection_tracking_tpu.models.reid import (
        shufflenetv2_reid_forward)
    torch.manual_seed(12)
    net = shufflenet_v2_x0_5(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 128, 64)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "snv2.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(shufflenetv2_reid_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 1024)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_pcb_parity(tmp_path):
    from torchreid.models.pcb import pcb_p4
    from object_detection_tracking_tpu.models.reid import pcb_reid_forward
    torch.manual_seed(13)
    net = pcb_p4(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 128, 64)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "pcb.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(pcb_reid_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))), "pcb_p4"))
    assert got.shape == want.shape == (2, 2048 * 4)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_mlfn_parity(tmp_path):
    from torchreid.models.mlfn import mlfn
    from object_detection_tracking_tpu.models.reid import mlfn_reid_forward
    torch.manual_seed(14)
    net = mlfn(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 128, 64)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "mlfn.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(mlfn_reid_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 1024)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_resnetmid_parity(tmp_path):
    from torchreid.models.resnetmid import resnet50mid
    from object_detection_tracking_tpu.models.reid import (
        resnetmid_reid_forward)
    torch.manual_seed(15)
    net = resnet50mid(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 128, 64)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "r50mid.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(resnetmid_reid_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 3072)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_shufflenetv1_parity(tmp_path):
    from torchreid.models.shufflenet import shufflenet
    from object_detection_tracking_tpu.models.reid import (
        shufflenetv1_reid_forward)
    torch.manual_seed(16)
    net = shufflenet(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 128, 64)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "snv1.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(shufflenetv1_reid_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 960)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_hacnn_parity(tmp_path):
    from torchreid.models.hacnn import HACNN
    from object_detection_tracking_tpu.models.reid import hacnn_reid_forward
    torch.manual_seed(17)
    net = HACNN(num_classes=10, use_gpu=False).eval()
    x = torch.randn(2, 3, 160, 64)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "hacnn.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(hacnn_reid_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 1024)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_mudeep_parity(tmp_path):
    from torchreid.models.mudeep import MuDeep
    from object_detection_tracking_tpu.models.reid import mudeep_reid_forward
    torch.manual_seed(18)
    net = MuDeep(num_classes=10).eval()
    x = torch.randn(2, 3, 256, 128)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "mudeep.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(mudeep_reid_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 4096)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_xception_parity(tmp_path):
    from torchreid.models.xception import Xception
    from object_detection_tracking_tpu.models.reid import (
        xception_reid_forward)
    torch.manual_seed(19)
    net = Xception(num_classes=10, loss="softmax").eval()
    x = torch.randn(2, 3, 128, 64)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "xc.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(xception_reid_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_inceptionv4_parity(tmp_path):
    from torchreid.models.inceptionv4 import InceptionV4
    from object_detection_tracking_tpu.models.reid import (
        inceptionv4_reid_forward)
    torch.manual_seed(20)
    net = InceptionV4(num_classes=10, loss="softmax").eval()
    x = torch.randn(2, 3, 160, 96)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "iv4.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(inceptionv4_reid_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 1536)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_inceptionresnetv2_parity(tmp_path):
    from torchreid.models.inceptionresnetv2 import InceptionResNetV2
    from object_detection_tracking_tpu.models.reid import (
        inceptionresnetv2_reid_forward)
    torch.manual_seed(21)
    net = InceptionResNetV2(num_classes=10).eval()
    x = torch.randn(2, 3, 160, 96)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "irv2.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(inceptionresnetv2_reid_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 1536)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_osnet_ibn_parity(tmp_path):
    from torchreid.models.osnet import osnet_ibn_x1_0
    torch.manual_seed(22)
    net = osnet_ibn_x1_0(num_classes=10, pretrained=False).eval()
    x = torch.randn(2, 3, 256, 128)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "osnet_ibn.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(osnet_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_nasnet_parity(tmp_path):
    from torchreid.models.nasnet import NASNetAMobile
    from object_detection_tracking_tpu.models.reid import nasnet_reid_forward
    torch.manual_seed(23)
    net = NASNetAMobile(num_classes=10, loss="softmax").eval()
    x = torch.randn(2, 3, 128, 64)
    with torch.no_grad():
        want = net(x).numpy()
    p = str(tmp_path / "nasnet.pth")
    torch.save(net.state_dict(), p)
    got = np.asarray(nasnet_reid_forward(
        _to_jax_params(p),
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    assert got.shape == want.shape == (2, 1056)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_registry_covers_reference():
    """Every model name in the reference torchreid registry
    (torchreid/models/__init__.py:25-69) resolves to a forward here."""
    import re
    from object_detection_tracking_tpu.models.reid.extractor import FORWARDS
    src = open("/root/reference/torchreid/models/__init__.py").read()
    names = set(re.findall(r"'([a-z0-9_\.]+)':", src))
    missing = sorted(n for n in names if n not in FORWARDS)
    assert not missing, f"unported torchreid models: {missing}"
