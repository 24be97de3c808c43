from fnssl_tpu.models.lstm import (
    lstm, init_lstm_params, LSTMState)
from fnssl_tpu.models.layers import (
    linear, init_linear_params, dropout, avg_pool_time)
from fnssl_tpu.models.fnssl import (
    FNSSLConfig, FNSSLState, init_fnssl_params, init_fnssl_state,
    fnssl_apply)
from fnssl_tpu.models.mamba import (
    MambaConfig, MambaState, init_mamba_params, init_mamba_state,
    mamba_apply, mamba_step)
from fnssl_tpu.models.retention import (
    RetentionConfig, RetNetRelPos, init_retention_params,
    retention_parallel, retention_chunkwise, retention_recurrent_step,
    rms_norm, theta_shift)
from fnssl_tpu.models.attention import (
    MHSAConfig, MHSAState, TConvFFNConfig, causal_mask, init_mhsa_params,
    init_mhsa_state, mhsa_apply, mhsa_apply_streaming,
    init_tconvffn_params, init_tconvffn_state, tconvffn_apply)
from fnssl_tpu.models.spatialnet import (
    SpatialNetConfig, SpatialNetState, RetentionState, get_causal_mask,
    init_spatialnet_params, init_spatialnet_state, spatialnet_apply)
from fnssl_tpu.models.ipdnet import (
    IPDnetConfig, IPDnetState, init_ipdnet_params, init_ipdnet_state,
    ipdnet_apply, VariableIPDnetConfig, init_variable_ipdnet_params,
    variable_ipdnet_apply)
