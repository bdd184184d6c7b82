"""Encoder temporal-stride-doubling x decoder interp configs
(reference: dynamic_enumeration_stride.py:1-135)."""
import argparse

from hunyuanvideo_efficiency_tpu.experiments import write_configs

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("base_config", nargs="?", default=None)
    p.add_argument("--output-dir", default="exp_configs_stride")
    p.add_argument("--cap", type=int, default=384)
    a = p.parse_args()
    paths = write_configs(a.output_dir, mode="stride", cap=a.cap)
    print(f"Wrote {len(paths)} configs to {a.output_dir}")
