from quant_tpu.config.parser import (
    get_base_argument_parser, parse_common_fields, parse_config,
)

__all__ = ['get_base_argument_parser', 'parse_common_fields', 'parse_config']
