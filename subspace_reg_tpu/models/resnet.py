"""RFS-style ResNet backbone (TPU-native NHWC Flax implementation).

Reproduces the reference topology exactly (models/resnet_language.py:101-192,
243-301,408-479): four stages at widths 64/160/320/640, each a chain of
``BasicBlock`` (3x conv3x3+BN+LeakyReLU(0.1), residual, stride via MaxPool,
optional SE, dropout/DropBlock), adaptive average pool, 640-d feature.
``resnet12``=[1,1,1,1], ``resnet18``=[1,1,2,2], ``resnet24``=[2,2,2,2] — these
are NOT torchvision ResNets.

Two reference quirks are deliberately replicated:

* positional-argument bug in ``_make_layer`` (models/resnet_language.py:155):
  when a stage has >1 block, the FIRST block receives ``use_se`` in the
  ``drop_block`` slot — so in resnet18's layers 3/4 only the LAST block has
  DropBlock, and seresnet variants lose SE on stage-entry blocks.
* ``no_dropblock`` sets block_size=1 but the stage-level drop_block flag for
  layers 3/4 stays hard-coded True (models/resnet_language.py:116-122) — the
  local override there is dead; DropBlock simply runs with 1x1 blocks and the
  ramped gamma.

The per-block ``num_batches_tracked`` counter (models/resnet_language.py:260,
269) becomes an explicit ``counters`` variable collection, incremented on
every forward when the collection is mutable — the ramped DropBlock schedule
(models/resnet_language.py:295-296) reads it.

The classifier head is deliberately NOT part of this module: FSCIL grows the
head across sessions, which on TPU is a statically-padded buffer + mask (see
``models/head.py``), not a module surgery.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from .layers import (
    DropBlock,
    SELayer,
    TorchBatchNorm,
    conv1x1,
    conv3x3,
    max_pool_torch,
)

WIDTHS = (64, 160, 320, 640)
FEATURE_DIM = 640


class BasicBlock(nn.Module):
    """Reference BasicBlock (models/resnet_language.py:243-301)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    drop_rate: float = 0.0
    drop_block: bool = False
    block_size: int = 1
    use_se: bool = False
    dtype: Any = None        # bf16 compute for the MXU; params stay f32
    tag_conv_outputs: bool = False
                             # checkpoint_name-tag conv outputs for the
                             # selective remat policy.  Off by default so
                             # the production program (and its persistent
                             # compile-cache entries) is unchanged when no
                             # policy consumes the tags.

    @nn.compact
    def __call__(self, x: jax.Array, train: bool,
                 sample_mask=None) -> jax.Array:
        # per-forward counter for the ramped DropBlock schedule
        nbt = self.variable("counters", "num_batches_tracked",
                            lambda: jnp.zeros((), jnp.int32))
        if not self.is_initializing() and self.is_mutable_collection("counters"):
            nbt.value = nbt.value + 1

        # conv outputs are checkpoint_name-tagged (only under the selective
        # remat policy) so remat_policy='conv' can save them while
        # recomputing the cheap BN/LeakyReLU/MaxPool tails in the backward
        tag = ((lambda v: checkpoint_name(v, "conv_out"))
               if self.tag_conv_outputs else (lambda v: v))
        residual = x
        out = conv3x3(self.planes, name="conv1", dtype=self.dtype)(x)
        out = tag(out)
        out = TorchBatchNorm(self.planes, name="bn1")(out, train, sample_mask)
        out = nn.leaky_relu(out, 0.1)

        out = conv3x3(self.planes, name="conv2", dtype=self.dtype)(out)
        out = tag(out)
        out = TorchBatchNorm(self.planes, name="bn2")(out, train, sample_mask)
        out = nn.leaky_relu(out, 0.1)

        out = conv3x3(self.planes, name="conv3", dtype=self.dtype)(out)
        out = tag(out)
        out = TorchBatchNorm(self.planes, name="bn3")(out, train, sample_mask)
        if self.use_se:
            out = SELayer(self.planes, reduction=4, name="se")(out)

        if self.has_downsample:
            residual = conv1x1(self.planes, name="ds_conv", dtype=self.dtype)(x)
            residual = tag(residual)
            residual = TorchBatchNorm(self.planes, name="ds_bn")(
                residual, train, sample_mask)
        out = out + residual
        out = nn.leaky_relu(out, 0.1)
        out = max_pool_torch(out, self.stride)

        if self.drop_rate > 0:
            if self.drop_block:
                feat_size = out.shape[1]
                bs = self.block_size
                keep_rate = jnp.maximum(
                    1.0 - self.drop_rate / (20 * 2000) * nbt.value.astype(jnp.float32),
                    1.0 - self.drop_rate)
                gamma = ((1.0 - keep_rate) / bs ** 2
                         * feat_size ** 2 / (feat_size - bs + 1) ** 2)
                out = DropBlock(block_size=bs, name="dropblock")(out, gamma, train)
            else:
                out = nn.Dropout(rate=self.drop_rate, deterministic=not train)(out)
        return out


def _stage_block_specs(n_block: int, planes: int, stride: int,
                       drop_rate: float, drop_block: bool, block_size: int,
                       use_se: bool) -> List[Dict[str, Any]]:
    """Per-block settings replicating _make_layer (models/resnet_language.py:142-167),
    including the positional-arg quirk on multi-block stage entries (:155)."""
    specs = []
    if n_block == 1:
        specs.append(dict(planes=planes, stride=stride, has_downsample=True,
                          drop_rate=drop_rate, drop_block=drop_block,
                          block_size=block_size, use_se=use_se))
        return specs
    # first block: block(inplanes, planes, stride, downsample, drop_rate, use_se)
    # => drop_block slot receives use_se, block_size defaults to 1, SE off.
    specs.append(dict(planes=planes, stride=stride, has_downsample=True,
                      drop_rate=drop_rate, drop_block=bool(use_se),
                      block_size=1, use_se=False))
    for i in range(1, n_block):
        if i == n_block - 1:
            specs.append(dict(planes=planes, stride=1, has_downsample=False,
                              drop_rate=drop_rate, drop_block=drop_block,
                              block_size=block_size, use_se=use_se))
        else:
            specs.append(dict(planes=planes, stride=1, has_downsample=False,
                              drop_rate=drop_rate, drop_block=False,
                              block_size=1, use_se=use_se))
    return specs


class ResNetRFS(nn.Module):
    """The backbone. Input NHWC uint8-normalized float; output 640-d features."""

    n_blocks: Sequence[int] = (1, 1, 1, 1)
    drop_rate: float = 0.0
    dropblock_size: int = 5
    no_dropblock: bool = False
    use_se: bool = False
    avg_pool: bool = True
    keep_prob: float = 1.0
    widths: Sequence[int] = WIDTHS   # narrow override for cheap test models
    dtype: Any = None                # bf16 compute path for pretraining
    remat: bool = False              # per-block rematerialization: backward
                                     # recomputes block internals from block
                                     # inputs instead of loading saved
                                     # activations from HBM (trades FLOPs
                                     # for activation traffic; measured in
                                     # tools/exp_remat.py)
    remat_policy: Optional[str] = None
                                     # None: full per-block remat (recompute
                                     # everything incl. convs).  'conv':
                                     # selective — jax.checkpoint policy
                                     # saves the checkpoint_name-tagged conv
                                     # outputs and recomputes only the
                                     # BN/LeakyReLU/MaxPool tails, attacking
                                     # activation traffic without paying
                                     # conv recompute FLOPs.

    @property
    def feature_dim(self) -> int:
        return self.widths[-1]

    def setup(self):
        block_size = 1 if self.no_dropblock else self.dropblock_size
        # argnum 2 (after self=0, x=1) is the static `train` bool
        if self.remat:
            if self.remat_policy is None:
                policy = None
            elif self.remat_policy == "conv":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "conv_out")
            else:
                raise ValueError(
                    f"unknown remat_policy {self.remat_policy!r}")
            block_cls = nn.remat(BasicBlock, static_argnums=(2,),
                                 policy=policy)
        else:
            block_cls = BasicBlock
        stages = []
        for li, (nb, planes) in enumerate(zip(self.n_blocks, self.widths)):
            # layers 3/4 pass drop_block=True in the reference ctor
            # (models/resnet_language.py:119-122); layers 1/2 default False.
            stage_drop_block = li >= 2
            specs = _stage_block_specs(
                nb, planes, stride=2, drop_rate=self.drop_rate,
                drop_block=stage_drop_block, block_size=block_size,
                use_se=self.use_se)
            blocks = tuple(
                block_cls(**spec, dtype=self.dtype,
                          tag_conv_outputs=self.remat_policy == "conv",
                          name=f"layer{li + 1}_{bi}")
                for bi, spec in enumerate(specs)
            )
            stages.append(blocks)
        self.stages = tuple(stages)

    def __call__(self, x: jax.Array, train: bool = False,
                 is_feat: bool = False, sample_mask=None):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = []
        for blocks in self.stages:
            for block in blocks:
                x = block(x, train, sample_mask)
            feats.append(x)
        if self.avg_pool:
            # pool in f32: 640-d feature fidelity matters downstream
            x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        else:
            x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        feat = x
        if is_feat:
            return feats + [feat], feat
        return feat


def _factory(n_blocks, use_se=False):
    def build(keep_prob: float = 1.0, avg_pool: bool = False,
              drop_rate: float = 0.0, dropblock_size: int = 5,
              no_dropblock: bool = False, dtype=None, **kwargs) -> ResNetRFS:
        return ResNetRFS(n_blocks=n_blocks, drop_rate=drop_rate,
                         dropblock_size=dropblock_size,
                         no_dropblock=no_dropblock, use_se=use_se,
                         avg_pool=avg_pool, keep_prob=keep_prob,
                         dtype=dtype)
    return build


# factories mirror reference models/resnet_language.py:408-479
resnet12 = _factory((1, 1, 1, 1))
resnet18 = _factory((1, 1, 2, 2))
resnet24 = _factory((2, 2, 2, 2))
resnet50 = _factory((3, 4, 6, 3))
resnet101 = _factory((3, 4, 23, 3))
seresnet12 = _factory((1, 1, 1, 1), use_se=True)
seresnet18 = _factory((1, 1, 2, 2), use_se=True)
seresnet24 = _factory((2, 2, 2, 2), use_se=True)
seresnet50 = _factory((3, 4, 6, 3), use_se=True)
seresnet101 = _factory((3, 4, 23, 3), use_se=True)
