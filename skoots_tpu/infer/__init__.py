from skoots_tpu.infer.engine import run_inference

__all__ = ["run_inference"]
