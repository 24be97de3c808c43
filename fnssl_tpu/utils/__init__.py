from fnssl_tpu.utils.audio_io import read_audio, write_audio
