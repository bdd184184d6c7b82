"""DiT configuration (reference: hyvideo/modules/models.py:448-760)."""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple


@dataclass(frozen=True)
class DiTConfig:
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 3072
    heads_num: int = 24
    mlp_width_ratio: float = 4.0
    mlp_act_type: str = "gelu_tanh"
    mm_double_blocks_depth: int = 20
    mm_single_blocks_depth: int = 40
    rope_dim_list: Tuple[int, int, int] = (16, 56, 56)
    qkv_bias: bool = True
    qk_norm: bool = True
    qk_norm_type: str = "rms"
    guidance_embed: bool = False
    text_states_dim: int = 4096
    text_states_dim_2: int = 768
    text_projection: str = "single_refiner"
    use_attention_mask: bool = True
    rope_theta: float = 256.0
    attn_mode: str = "auto"  # sdpa | chunked | flash | flash_int8 | auto
    # remat ("gradient checkpointing") of each scanned block; harmless at
    # inference, required for training-mode memory
    remat_blocks: bool = False
    # Sequence-parallel mesh axis names; set when the forward runs inside
    # shard_map (see parallel/sp_dit.py). None = single-device attention.
    ulysses_axis: Optional[str] = None
    ring_axis: Optional[str] = None
    # Ring hops through the Pallas flash kernel (merge_flash_states fold).
    # The raw kernel has no JVP rule, so training (make_sp_train_step)
    # turns this off and ring hops fold through the differentiable einsum
    # recurrence instead; inference keeps kernel-speed hops.
    flash_ring_kernel: bool = True
    # Token-chunked MLP branches: bounds the [L, mlp_hidden] transient so
    # 720p-class token counts fit one chip. None = unchunked.
    mlp_chunk_tokens: Optional[int] = None
    # Split attention into N sequential head groups (joint-rope path only):
    # q/k/v are projected per group from column slices of the fused qkv
    # weights and the output projection accumulates from row slices —
    # algebraically identical, but full-sequence q/k/v buffers never exist
    # (each group's working set is 1/N), which is what fits 720p x 129f on
    # a single 16 GB chip. 1 = off.
    attn_head_chunks: int = 1
    # Pad the text segment so img_len + txt_len is a multiple of this
    # (the flash kernel block size): removes the attention wrapper's
    # full-sequence pad copies (~1.4 GB peak at 720p). None = no padding.
    seq_pad_multiple: Optional[int] = None
    # Sliding Tile Attention (attn_mode="sta"; ops/sta.py): tile shape in
    # (t, h, w) patch-grid units (product = kernel block) and the sliding
    # window in tiles. Sparse attention — opt-in quality/speed trade.
    sta_tile: Tuple[int, int, int] = (4, 8, 8)
    sta_window: Tuple[int, int, int] = (3, 3, 3)
    # First N double/single blocks keep DENSE attention under attn_mode=
    # "sta" (the paper keeps a few full-attention layers for quality).
    sta_dense_double_blocks: int = 0
    sta_dense_single_blocks: int = 0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.heads_num

    @property
    def mlp_hidden_dim(self) -> int:
        return int(self.hidden_size * self.mlp_width_ratio)

    def __post_init__(self):
        if self.hidden_size % self.heads_num != 0:
            raise ValueError(
                f"hidden_size {self.hidden_size} % heads_num {self.heads_num} != 0")
        if sum(self.rope_dim_list) != self.head_dim:
            raise ValueError(
                f"sum(rope_dim_list) {sum(self.rope_dim_list)} != head_dim {self.head_dim}")


# Registry (reference: hyvideo/modules/models.py:742-760 +
# hyvideo/modules/__init__.py:4-26)
HUNYUAN_VIDEO_CONFIG = {
    "HYVideo-T/2": DiTConfig(),
    "HYVideo-T/2-cfgdistill": DiTConfig(guidance_embed=True),
}


def load_dit_config(name: str, **overrides) -> DiTConfig:
    if name not in HUNYUAN_VIDEO_CONFIG:
        raise ValueError(f"Unknown model name {name}; have {list(HUNYUAN_VIDEO_CONFIG)}")
    return replace(HUNYUAN_VIDEO_CONFIG[name], **overrides)
