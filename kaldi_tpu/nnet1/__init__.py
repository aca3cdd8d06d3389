"""nnet1-equivalent: recurrent acoustic models + RBM pretraining.

(ref: src/nnet ("nnet1", Karel Vesely's framework) — LSTM/BLSTM projected
 multi-stream nets nnet/nnet-lstm-projected-streams.h, RBM pretraining
 nnet/nnet-rbm.h, 1D conv/pooling nnet/nnet-convolutional-component.h,
 losses nnet/nnet-loss.h:59,112, frame shuffling nnet/nnet-randomizer.h:66,
 trainers nnetbin/nnet-train-{frmshuff,lstm-streams}.cc.)
"""

from kaldi_tpu.nnet1.lstm import (LstmProjected, LstmConfig, blstm_apply,
                                  lstm_init, lstm_apply)
from kaldi_tpu.nnet1.rbm import Rbm, RbmConfig
from kaldi_tpu.nnet1.train import (train_lstm_streams, StreamTrainOpts,
                                   xent_loss, mse_loss, FrameShuffler)

__all__ = [
    "LstmProjected", "LstmConfig", "lstm_init", "lstm_apply", "blstm_apply",
    "Rbm", "RbmConfig",
    "train_lstm_streams", "StreamTrainOpts", "xent_loss", "mse_loss",
    "FrameShuffler",
]
