from quant_tpu.serving.engine import InferenceEngine, ServingFrontend

__all__ = ['InferenceEngine', 'ServingFrontend']
