"""ReID feature extractors: OSNet (persons) + ResNet-50/101 (vehicles).

JAX reimplementations of the torchreid models the reference vendors
(torchreid/models/osnet.py, resnet.py), parameterized by FLAT dicts keyed
with the original torch state_dict names — weight conversion from .pth is a
pure transpose pass (utils in extractor.py), and parity can be checked
layer-by-layer against torch (cpu) in tests.
"""

from .densenet_reid import densenet_reid_forward  # noqa: F401
from .extractor import FeatureExtractor  # noqa: F401
from .hacnn_reid import hacnn_reid_forward  # noqa: F401
from .ibn_reid import ibn_reid_forward  # noqa: F401
from .inceptionresnetv2_reid import (  # noqa: F401
    inceptionresnetv2_reid_forward)
from .inceptionv4_reid import inceptionv4_reid_forward  # noqa: F401
from .mlfn_reid import mlfn_reid_forward  # noqa: F401
from .mudeep_reid import mudeep_reid_forward  # noqa: F401
from .nasnet_reid import nasnet_reid_forward  # noqa: F401
from .shufflenetv1_reid import shufflenetv1_reid_forward  # noqa: F401
from .xception_reid import xception_reid_forward  # noqa: F401
from .pcb_reid import pcb_reid_forward  # noqa: F401
from .resnetmid_reid import resnetmid_reid_forward  # noqa: F401
from .shufflenet_reid import shufflenetv2_reid_forward  # noqa: F401
from .squeezenet_reid import squeezenet_reid_forward  # noqa: F401
from .mobilenetv2 import mobilenetv2_forward  # noqa: F401
from .osnet import osnet_ain_forward, osnet_forward  # noqa: F401
from .resnet_reid import resnet_reid_forward  # noqa: F401
from .senet_reid import senet_reid_forward  # noqa: F401
