from quant_tpu.serving.engine import InferenceEngine, ServingFrontend
from quant_tpu.serving.rpc import EngineServer, RemoteEngineClient
from quant_tpu.serving.worker import spawn_engine_workers

__all__ = ['InferenceEngine', 'ServingFrontend', 'EngineServer',
           'RemoteEngineClient', 'spawn_engine_workers']
