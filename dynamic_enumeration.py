"""Generate one-hot pool x interp experiment configs
(reference: dynamic_enumeration.py:10-121)."""
import argparse

from hunyuanvideo_efficiency_tpu.experiments import write_configs

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("base_config", nargs="?", default=None,
                   help="accepted for reference CLI parity; schema is built in")
    p.add_argument("--output-dir", default="exp_configs")
    p.add_argument("--cap", type=int, default=384)
    a = p.parse_args()
    paths = write_configs(a.output_dir, mode="pool", cap=a.cap)
    print(f"Wrote {len(paths)} configs to {a.output_dir}")
