from quant_tpu.serving.engine import InferenceEngine, ServingFrontend
from quant_tpu.serving.rpc import EngineServer, RemoteEngineClient
from quant_tpu.serving.prepare import (
    load_serving_artifact, prepare_serving_artifact,
)
from quant_tpu.serving.worker import spawn_engine_workers

__all__ = ['InferenceEngine', 'ServingFrontend', 'EngineServer',
           'RemoteEngineClient', 'spawn_engine_workers',
           'prepare_serving_artifact', 'load_serving_artifact']
