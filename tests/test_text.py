"""Text encoder parity vs HF torch oracles (tiny random-init models) +
wrapper behavior (templates, crop_start, masks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanvideo_efficiency_tpu.constants import PROMPT_TEMPLATE
from hunyuanvideo_efficiency_tpu.models.text import (
    CLIPTextConfig, HashTokenizer, LlamaConfig, TextEncoder, clip_encode,
    convert_clip_state_dict, convert_llama_state_dict, llama_encode)

TINY_LLAMA = LlamaConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0)

TINY_CLIP = CLIPTextConfig(
    vocab_size=96, hidden_size=48, intermediate_size=96,
    num_hidden_layers=3, num_attention_heads=4,
    max_position_embeddings=32, eos_token_id=95)


class TestLlamaParity:
    @pytest.fixture(scope="class")
    def oracle(self):
        import torch
        from transformers import LlamaConfig as HFLlamaConfig
        from transformers import LlamaModel

        torch.manual_seed(0)
        hf_cfg = HFLlamaConfig(
            vocab_size=TINY_LLAMA.vocab_size,
            hidden_size=TINY_LLAMA.hidden_size,
            intermediate_size=TINY_LLAMA.intermediate_size,
            num_hidden_layers=TINY_LLAMA.num_hidden_layers,
            num_attention_heads=TINY_LLAMA.num_attention_heads,
            num_key_value_heads=TINY_LLAMA.num_key_value_heads,
            rope_theta=TINY_LLAMA.rope_theta,
            rms_norm_eps=TINY_LLAMA.rms_norm_eps,
            attention_bias=False, mlp_bias=False,
            attn_implementation="eager")
        model = LlamaModel(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_llama_state_dict(sd, TINY_LLAMA)
        return model, params

    def _inputs(self, b=2, l=12):
        rng = np.random.RandomState(0)
        ids = rng.randint(2, TINY_LLAMA.vocab_size, (b, l)).astype(np.int64)
        mask = np.ones((b, l), np.int64)
        mask[1, 8:] = 0
        return ids, mask

    @pytest.mark.parametrize("skip", [0, 2])
    def test_hidden_state_tap(self, oracle, skip):
        import torch

        model, params = oracle
        ids, mask = self._inputs()
        with torch.no_grad():
            out = model(input_ids=torch.from_numpy(ids),
                        attention_mask=torch.from_numpy(mask),
                        output_hidden_states=True)
        ref = out.hidden_states[-(skip + 1)].numpy()
        got = llama_encode(params, jnp.asarray(ids, jnp.int32),
                           jnp.asarray(mask, jnp.int32), TINY_LLAMA,
                           hidden_state_skip_layer=skip, dtype=jnp.float32)
        # compare only valid positions (HF pads can diverge freely)
        m = mask[..., None].astype(bool)
        np.testing.assert_allclose(
            np.where(m, np.asarray(got), 0), np.where(m, ref, 0),
            rtol=2e-3, atol=2e-3)


class TestCLIPParity:
    @pytest.fixture(scope="class")
    def oracle(self):
        import torch
        from transformers import CLIPTextConfig as HFCLIPTextConfig
        from transformers import CLIPTextModel

        torch.manual_seed(0)
        hf_cfg = HFCLIPTextConfig(
            vocab_size=TINY_CLIP.vocab_size,
            hidden_size=TINY_CLIP.hidden_size,
            intermediate_size=TINY_CLIP.intermediate_size,
            num_hidden_layers=TINY_CLIP.num_hidden_layers,
            num_attention_heads=TINY_CLIP.num_attention_heads,
            max_position_embeddings=TINY_CLIP.max_position_embeddings,
            eos_token_id=TINY_CLIP.eos_token_id,
            bos_token_id=94, hidden_act="quick_gelu",
            attn_implementation="eager")
        model = CLIPTextModel(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_clip_state_dict(sd, TINY_CLIP)
        return model, params

    def test_pooled_and_hidden(self, oracle):
        import torch

        model, params = oracle
        rng = np.random.RandomState(1)
        b, l = 2, 16
        ids = rng.randint(2, 90, (b, l)).astype(np.int64)
        ids[0, 10] = TINY_CLIP.eos_token_id
        ids[1, 5] = TINY_CLIP.eos_token_id
        mask = np.ones((b, l), np.int64)
        with torch.no_grad():
            out = model(input_ids=torch.from_numpy(ids),
                        attention_mask=torch.from_numpy(mask))
        hidden, pooled = clip_encode(params, jnp.asarray(ids, jnp.int32),
                                     jnp.asarray(mask, jnp.int32), TINY_CLIP)
        np.testing.assert_allclose(np.asarray(hidden),
                                   out.last_hidden_state.numpy(),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(),
                                   rtol=2e-3, atol=2e-3)


class TestTextEncoderWrapper:
    def test_llm_crop_start_and_mask(self):
        tpl = {"template": "INSTRUCT a b c {}", "crop_start": 5}
        enc = TextEncoder(
            "llm", max_length=16 + 5, model_config=TINY_LLAMA,
            prompt_template=tpl, prompt_template_video=tpl,
            hidden_state_skip_layer=2, dtype=jnp.float32,
            init_key=jax.random.PRNGKey(0))
        out = enc("a cat", data_type="video")
        assert out.hidden_state.shape == (1, 16, TINY_LLAMA.hidden_size)
        assert out.attention_mask.shape == (1, 16)
        assert np.isfinite(np.asarray(out.hidden_state)).all()

    def test_clip_pooled_shape(self):
        enc = TextEncoder("clipL", max_length=16, model_config=TINY_CLIP,
                          dtype=jnp.float32,
                          init_key=jax.random.PRNGKey(1))
        out = enc(["a cat", "a dog"])
        assert out.hidden_state.shape == (2, TINY_CLIP.hidden_size)
        assert out.attention_mask is None

    def test_encode_prompt_repeats(self):
        enc = TextEncoder("llm", max_length=8, model_config=TINY_LLAMA,
                          hidden_state_skip_layer=2, dtype=jnp.float32,
                          init_key=jax.random.PRNGKey(2))
        pe, mask = enc.encode_prompt("hello world", num_videos=3)
        assert pe.shape[0] == 3 and mask.shape[0] == 3

    def test_template_validation(self):
        with pytest.raises(ValueError):
            TextEncoder("llm", 8, model_config=TINY_LLAMA,
                        prompt_template={"template": "no placeholder"},
                        init_key=jax.random.PRNGKey(0))
        with pytest.raises(ValueError):
            TextEncoder("t5", 8)

    def test_reference_templates_roundtrip(self):
        # the shipped templates must contain the placeholder and known crops
        assert PROMPT_TEMPLATE["dit-llm-encode"]["crop_start"] == 36
        assert PROMPT_TEMPLATE["dit-llm-encode-video"]["crop_start"] == 95
        assert "{}" in PROMPT_TEMPLATE["dit-llm-encode-video"]["template"]


class TestOffload:
    def test_offload_and_reload_roundtrip(self):
        import numpy as np

        enc = TextEncoder("llm", max_length=8, model_config=TINY_LLAMA,
                          hidden_state_skip_layer=2, dtype=jnp.float32,
                          init_key=jax.random.PRNGKey(3))
        before = enc("hello").hidden_state
        enc.offload()
        assert all(isinstance(x, np.ndarray)
                   for x in jax.tree.leaves(enc.params))
        enc.load()
        after = enc("hello").hidden_state
        np.testing.assert_allclose(np.asarray(before), np.asarray(after))


class TestShardedLlama:
    """Tensor-parallel LLM tower: XLA-partitioned forward must match the
    single-device forward exactly (placement only, no model change)."""

    @pytest.fixture(scope="class")
    def mesh(self):
        from hunyuanvideo_efficiency_tpu.parallel import (ParallelConfig,
                                                          make_mesh)

        return make_mesh(ParallelConfig(dp_degree=2, ulysses_degree=2,
                                        ring_degree=2))

    def test_sharded_encode_matches(self, mesh):
        from hunyuanvideo_efficiency_tpu.models.text.llama import (
            init_llama_params, shard_llama_params)

        params = init_llama_params(jax.random.PRNGKey(0), TINY_LLAMA,
                                   jnp.float32)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(
                0, TINY_LLAMA.vocab_size, (2, 16)), jnp.int32)
        mask = jnp.asarray([[1] * 16, [1] * 10 + [0] * 6], jnp.int32)
        plain = llama_encode(params, ids, mask, TINY_LLAMA,
                             hidden_state_skip_layer=2, dtype=jnp.float32)
        sharded_params = shard_llama_params(params, mesh)
        # layer kernels actually sharded (not silently replicated)
        q = sharded_params["layers"]["self_attn"]["q_proj"]["kernel"]
        assert len(q.sharding.device_set) == 8
        sharded = llama_encode(sharded_params, ids, mask, TINY_LLAMA,
                               hidden_state_skip_layer=2, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded),
                                   rtol=2e-5, atol=2e-5)

    def test_wrapper_mesh_and_offload_reload(self, mesh):
        enc = TextEncoder("llm", max_length=8, model_config=TINY_LLAMA,
                          hidden_state_skip_layer=2, dtype=jnp.float32,
                          init_key=jax.random.PRNGKey(3), mesh=mesh)
        assert enc.mesh is not None
        before = enc("hello world").hidden_state
        enc.offload()
        enc.load()  # must restore the tensor-parallel placement
        q = enc.params["layers"]["self_attn"]["q_proj"]["kernel"]
        assert len(q.sharding.device_set) == 8
        after = enc("hello world").hidden_state
        np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                                   rtol=2e-5, atol=2e-5)


class TestLlamaInt8Tier:
    """int8 storage tier for the LLM tower (single-chip fit;
    llama.quantize_llama_params_int8 / init_llama_params_int8)."""

    def _ids(self, b=2, l=16):
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, TINY_LLAMA.vocab_size, (b, l)),
                          jnp.int32)
        mask = jnp.asarray([[1] * l, [1] * (l - 6) + [0] * 6], jnp.int32)
        return ids, mask

    def test_quantized_encode_close_to_fp(self):
        from hunyuanvideo_efficiency_tpu.models.text import (
            init_llama_params, quantize_llama_params_int8)

        params = init_llama_params(jax.random.PRNGKey(0), TINY_LLAMA,
                                   jnp.float32)
        q = quantize_llama_params_int8(params)
        k = q["layers"]["self_attn"]["q_proj"]
        assert k["kernel"].dtype == jnp.int8
        assert "scale_out" in k
        # embedding / norms stay high precision
        assert q["embed_tokens"]["embedding"].dtype == params[
            "embed_tokens"]["embedding"].dtype

        ids, mask = self._ids()
        ref = llama_encode(params, ids, mask, TINY_LLAMA,
                           hidden_state_skip_layer=2, dtype=jnp.float32)
        out = llama_encode(q, ids, mask, TINY_LLAMA,
                           hidden_state_skip_layer=2, dtype=jnp.float32)
        ref, out = np.asarray(ref), np.asarray(out)
        assert np.isfinite(out).all()
        # W8A8 keeps activations directionally faithful (loose tolerance:
        # two roundings per linear, 4 layers deep)
        cos = (ref * out).sum() / (np.linalg.norm(ref) *
                                   np.linalg.norm(out))
        assert cos > 0.995, cos
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.2, rel

    def test_numpy_tree_quantization(self):
        from hunyuanvideo_efficiency_tpu.models.text import (
            init_llama_params, quantize_llama_params_int8)

        params = jax.tree.map(np.asarray, init_llama_params(
            jax.random.PRNGKey(0), TINY_LLAMA, jnp.float32))
        q = quantize_llama_params_int8(params)
        k = q["layers"]["self_attn"]["o_proj"]
        assert isinstance(k["kernel"], np.ndarray)
        assert k["kernel"].dtype == np.int8
        # device-side quantization of the same tree agrees bit-exactly
        qd = quantize_llama_params_int8(jax.tree.map(jnp.asarray, params))
        np.testing.assert_array_equal(
            np.asarray(qd["layers"]["self_attn"]["o_proj"]["kernel"]),
            k["kernel"])

    def test_incremental_init_matches_quantized_full_init(self):
        from hunyuanvideo_efficiency_tpu.models.text import (
            init_llama_params, init_llama_params_int8,
            quantize_llama_params_int8)

        key = jax.random.PRNGKey(7)
        inc = init_llama_params_int8(key, TINY_LLAMA)
        full = quantize_llama_params_int8(
            init_llama_params(key, TINY_LLAMA, jnp.float32))
        np.testing.assert_array_equal(
            np.asarray(inc["layers"]["mlp"]["down_proj"]["kernel"]),
            np.asarray(full["layers"]["mlp"]["down_proj"]["kernel"]))
        np.testing.assert_allclose(
            np.asarray(inc["layers"]["mlp"]["down_proj"]["scale_out"]),
            np.asarray(full["layers"]["mlp"]["down_proj"]["scale_out"]),
            rtol=1e-6)
        ids, mask = self._ids()
        out = llama_encode(inc, ids, mask, TINY_LLAMA,
                           hidden_state_skip_layer=2, dtype=jnp.float32)
        assert np.isfinite(np.asarray(out)).all()

    def test_wrapper_quant_and_free(self):
        tpl = PROMPT_TEMPLATE["dit-llm-encode-video"]
        tiny_tpl = {"template": tpl["template"], "crop_start": 3}
        enc = TextEncoder("llm", max_length=24, model_config=TINY_LLAMA,
                          prompt_template=tiny_tpl,
                          prompt_template_video=tiny_tpl,
                          hidden_state_skip_layer=2, dtype=jnp.float32,
                          init_key=jax.random.PRNGKey(3), quant="int8")
        k = enc.params["layers"]["self_attn"]["q_proj"]["kernel"]
        assert k.dtype == jnp.int8
        out = enc("a cat walks", data_type="video")
        assert out.hidden_state.shape[1] == 24 - 3  # crop_start applied
        assert np.isfinite(np.asarray(out.hidden_state)).all()
        enc.free()
        assert enc.params is None

    def test_wrapper_rejects_unknown_quant(self):
        with pytest.raises(ValueError):
            TextEncoder("llm", max_length=8, model_config=TINY_LLAMA,
                        quant="int3")
