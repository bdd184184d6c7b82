"""HTTP serving endpoint: drive /generate and /healthz end-to-end."""
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanvideo_efficiency_tpu.config import InferenceArgs
from hunyuanvideo_efficiency_tpu.inference import HunyuanVideoSampler
from hunyuanvideo_efficiency_tpu.models.dit import init_dit_params
from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
from hunyuanvideo_efficiency_tpu.models.text import (CLIPTextConfig,
                                                     LlamaConfig, TextEncoder)
from hunyuanvideo_efficiency_tpu.models.vae import (AutoencoderKLCausal3D,
                                                    init_vae_params)
from hunyuanvideo_efficiency_tpu.models.vae_config import VAEConfig


@pytest.fixture(scope="module")
def server():
    import serve as serve_mod

    cfg = DiTConfig(hidden_size=128, heads_num=4, mm_double_blocks_depth=1,
                    mm_single_blocks_depth=1, rope_dim_list=(8, 12, 12),
                    text_states_dim=64, text_states_dim_2=48,
                    attn_mode="sdpa")
    llm = TextEncoder("llm", max_length=10,
                      model_config=LlamaConfig(
                          vocab_size=256, hidden_size=64,
                          intermediate_size=96, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2),
                      hidden_state_skip_layer=1, dtype=jnp.float32)
    clip = TextEncoder("clipL", max_length=16,
                       model_config=CLIPTextConfig(
                           vocab_size=96, hidden_size=48,
                           intermediate_size=96, num_hidden_layers=2,
                           num_attention_heads=4,
                           max_position_embeddings=77, eos_token_id=95),
                       dtype=jnp.float32)
    vcfg = VAEConfig(block_out_channels=(32, 32, 64, 64), layers_per_block=1)
    vae = AutoencoderKLCausal3D(
        vcfg, init_vae_params(jax.random.PRNGKey(0), vcfg))
    args = InferenceArgs(text_states_dim=64, text_states_dim_2=48,
                         vae_tiling=False)
    sampler = HunyuanVideoSampler(args, vae, llm, clip,
                                  init_dit_params(jax.random.PRNGKey(1), cfg),
                                  cfg)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                serve_mod.make_handler(sampler))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["devices"] >= 1


def test_generate_returns_mp4(server):
    req = urllib.request.Request(
        f"{server}/generate",
        data=json.dumps({"prompt": "a cat", "width": 32, "height": 32,
                         "video_length": 5, "infer_steps": 1,
                         "seed": 3}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        data = r.read()
        assert r.headers["Content-Type"] == "video/mp4"
        assert r.headers["X-Seed"] == "3"
    assert len(data) > 500  # a real mp4 container

def test_generate_bad_request(server):
    req = urllib.request.Request(
        f"{server}/generate", data=b'{"no_prompt": 1}',
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_generate_bad_video_length(server):
    req = urllib.request.Request(
        f"{server}/generate",
        data=json.dumps({"prompt": "x", "video_length": 6,
                         "width": 32, "height": 32,
                         "infer_steps": 1}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "multiple of 4" in json.loads(e.read())["error"]
