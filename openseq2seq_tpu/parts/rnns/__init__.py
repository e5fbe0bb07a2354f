from .rnn import LSTM, GRU, BiRNN, GLSTM, make_rnn
