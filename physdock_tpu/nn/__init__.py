from physdock_tpu.nn.primitives import (  # noqa: F401
    AdaLayerNormZero,
    DiTTransition,
    FeedForward,
    LayerNorm,
    Linear,
    OuterProductMean,
    RMSNorm,
    TimestepEmbeddings,
    Transition,
)
