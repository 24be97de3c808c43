from fnssl_tpu.train.convert import (
    flat_to_nested, nested_to_flat, torch_state_dict_to_params,
    params_to_torch_state_dict)
from fnssl_tpu.train.losses import (
    mse_ipd_loss, ce_doa_loss, pit_mse_loss, pit_permutation)
from fnssl_tpu.train.preprocess import (
    stft_features, make_fnssl_preprocess, make_ipdnet_preprocess)
from fnssl_tpu.train.step import (
    TrainState, exponential_epoch_schedule, make_optimizer,
    init_train_state, make_train_step, make_eval_step)
