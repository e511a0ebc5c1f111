from data_bridge_spark.plans.config import load_stream_config
from data_bridge_spark.plans.models import (
    DestinationResponse,
    ExtractStep,
    LoadStep,
    Stream,
    TransformStep,
)
from data_bridge_spark.plans.runner import StreamRunner

__all__ = [
    "DestinationResponse",
    "ExtractStep",
    "LoadStep",
    "Stream",
    "TransformStep",
    "StreamRunner",
    "load_stream_config",
]
