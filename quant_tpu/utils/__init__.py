from quant_tpu.utils.logging_utils import init_logging

__all__ = ['init_logging']
