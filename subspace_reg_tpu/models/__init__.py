"""Model registry (reference models/__init__.py:1-11 exposes model_pool/model_dict).

The TPU build registers all RFS-ResNet variants the reference defines
(reference models/resnet_language.py:408-479), not just the two the
reference lists in its pool.
"""

from .resnet import (
    ResNetRFS,
    resnet12, resnet18, resnet24, resnet50, resnet101,
    seresnet12, seresnet18, seresnet24, seresnet50, seresnet101,
)

model_pool = ["resnet12", "resnet18"]

model_dict = {
    "resnet12": resnet12,
    "resnet18": resnet18,
    "resnet24": resnet24,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "seresnet12": seresnet12,
    "seresnet18": seresnet18,
    "seresnet24": seresnet24,
    "seresnet50": seresnet50,
    "seresnet101": seresnet101,
}
