from convofusion_tpu.ops.attention import MultiheadAttention
from convofusion_tpu.ops.positional import (
    PositionEmbeddingLearned1D,
    PositionEmbeddingSine1D,
    PositionEmbeddingSineBH,
    build_position_encoding,
    sinusoid_table,
)
from convofusion_tpu.ops.embeddings import TimestepEmbedding, Timesteps
from convofusion_tpu.ops.transformer import (
    SkipTransformerDecoder,
    SkipTransformerEncoder,
    TimeBlock,
    TransformerDecoderLayer,
    TransformerDecoderLayer2Att,
    TransformerEncoderLayer,
    DenoiserDecoder,
)
from convofusion_tpu.ops.smoothing import gaussian_smooth_2d
