from quant_tpu.serving.engine import InferenceEngine

__all__ = ['InferenceEngine']
