"""ResNet-50 — BASELINE config #2 (deeper conv stack; the reference's
``resnet50_test.cc`` integration model).

Bottleneck residual blocks emitted unfused (conv/bn/relu/elementwise_add as
separate ops); the pipeline folds BN, fuses the shortcut add into the
expansion conv as ResidualData and the trailing relu into its epilogue —
reproducing what conv_bn/conv_elementwise/conv_activation fuse passes did
for the reference, which is what keeps the whole residual block inside one
int8 kernel launch.

Winograd note (SURVEY §7.3): the reference ran fp32 3x3 convs via Winograd
F(2,3)/F(4,3) on ARM to cut multiplies; on the MXU dense matmul throughput
makes Winograd's transform overhead a net loss, so 3x3 convs lower
directly.  Measured on the v5e at all four ResNet-50 3x3 stages (b32):
direct wins 4-25x over an output-correct bf16 F(2,3) pipeline, int8 direct
another ~1.8x on top — full table in docs/ROOFLINE.md ("Winograd F(2,3) vs
direct"), study in tools/studies/winograd.py.
"""

from __future__ import annotations

from ..core.builder import GraphBuilder
from ..core.ir import Graph

_STAGES = [  # (num_blocks, mid_channels, out_channels, first_stride)
    (3, 64, 256, 1),
    (4, 128, 512, 2),
    (6, 256, 1024, 2),
    (3, 512, 2048, 2),
]


def _bottleneck(b: GraphBuilder, x: str, mid: int, out: int, stride: int,
                project: bool, residual: bool = True) -> str:
    if not residual:
        # ablation: pure conv chain (no projection conv, no skip add) —
        # isolates the residual machinery's cost (projection GEMMs + the
        # add's int8 requant boundary) as an end-to-end delta
        y = b.conv_bn_act(x, mid, 1, act="relu")
        y = b.conv_bn_act(y, mid, 3, stride=stride, padding=1, act="relu")
        y = b.conv2d(y, out, 1)
        y = b.batch_norm(y)
        return b.act(y, "relu")
    if project:
        shortcut = b.conv2d(x, out, 1, stride=stride)
        shortcut = b.batch_norm(shortcut)
    else:
        shortcut = x
    y = b.conv_bn_act(x, mid, 1, act="relu")
    y = b.conv_bn_act(y, mid, 3, stride=stride, padding=1, act="relu")
    y = b.conv2d(y, out, 1)
    y = b.batch_norm(y)
    y = b.eltwise(y, shortcut, "add")
    return b.act(y, "relu")


def build(batch: int = 1, image_size: int = 224, num_classes: int = 1000,
          seed: int = 0, with_softmax: bool = True,
          ablate_residual: bool = False, ablate_stem: bool = False,
          ablate_head: bool = False) -> Graph:
    """``ablate_*``: whole-model ablation variants for the model-level
    roofline attribution study (tools/studies/r50_roofline_r4.py) — same
    shapes, one structural piece removed, costs read as end-to-end deltas."""
    b = GraphBuilder("resnet50", seed=seed)
    x = b.input("image", (batch, image_size, image_size, 3))
    if ablate_stem:
        x = b.conv_bn_act(x, 64, 1, stride=2, act="relu")  # cheap 1x1 stem
    else:
        x = b.conv_bn_act(x, 64, 7, stride=2, padding=3, act="relu")
    x = b.pool2d(x, "max", ksize=3, stride=2, padding=1)
    for n_blocks, mid, out, stride in _STAGES:
        for i in range(n_blocks):
            x = _bottleneck(b, x, mid, out,
                            stride=stride if i == 0 else 1,
                            project=(i == 0),
                            residual=not ablate_residual)
    x = b.pool2d(x, "avg", global_pooling=True)
    x = b.reshape(x, (batch, 2048))
    if not ablate_head:
        x = b.fc(x, num_classes, name="classifier")
        if with_softmax:
            x = b.softmax(x)
    b.mark_output(x)
    return b.build()
