"""Online/streaming runtime (ref: src/online2): streaming feature
pipeline, online CMVN, chunked decoding with carried state, endpointing,
real-time-factor accounting."""

from kaldi_tpu.online.features import (OnlineMfcc, OnlineCmvn,
                                       OnlineFeaturePipeline)
from kaldi_tpu.online.decoder import OnlineDecoder
from kaldi_tpu.online.endpoint import EndpointRule, EndpointConfig, endpoint_detected
from kaldi_tpu.online.timing import OnlineTimer, OnlineTimingStats
