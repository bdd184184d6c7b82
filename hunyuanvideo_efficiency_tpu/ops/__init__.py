from .norms import rms_norm, layer_norm, group_norm
from .rope import get_nd_rotary_pos_embed, apply_rotary_emb
from .conv3d import causal_conv3d, causal_avg_pool_t, upsample_nearest_causal_3d
from .attention import sdpa_attention, attention, padding_key_bias
