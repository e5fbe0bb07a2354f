from .rnn import LSTM, GRU, BiRNN, make_rnn
