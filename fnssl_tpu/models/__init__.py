from fnssl_tpu.models.lstm import (
    lstm, init_lstm_params, LSTMState)
from fnssl_tpu.models.layers import (
    linear, init_linear_params, dropout, avg_pool_time)
from fnssl_tpu.models.fnssl import (
    FNSSLConfig, FNSSLState, init_fnssl_params, init_fnssl_state,
    fnssl_apply)
