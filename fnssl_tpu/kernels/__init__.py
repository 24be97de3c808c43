from fnssl_tpu.kernels.lstm_pallas import lstm_fused_scan, pallas_available
