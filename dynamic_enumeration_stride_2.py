"""Choose-2 encoder stride x choose-2 decoder interp configs; output dir from
argv (reference: dynamic_enumeration_stride_2.py:1-106)."""
import sys

from hunyuanvideo_efficiency_tpu.experiments import write_configs

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "exp_configs_stride_2"
    paths = write_configs(out, mode="stride2", cap=384)
    print(f"Wrote {len(paths)} configs to {out}")
