from fnssl_tpu.data.params import Parameter, as_parameter
from fnssl_tpu.data.arrays import (
    ArraySetup, dualch_array_setup, dicit_array_setup, linear_array_setup,
    circular_array_geometry, audiowu_high_array_geometry)
from fnssl_tpu.data.vad import frame_vad, clean_silences
from fnssl_tpu.data.noise import NoiseDataset, gen_diffuse_noise, mix_signals
from fnssl_tpu.data.scene import (
    AcousticScene, acoustic_power, save_file, load_file)
from fnssl_tpu.data.sources import LibriSpeechDataset, SyntheticSpeechDataset
from fnssl_tpu.data.trajectory import RandomTrajectoryDataset
from fnssl_tpu.data.segmenting import Segmenting
from fnssl_tpu.data.fixed import FixTrajectoryDataset, collate_segmented
from fnssl_tpu.data.simu import (
    make_fnssl_trajectory_dataset, make_ipdnet_trajectory_dataset,
    generate)
from fnssl_tpu.data.segments import (
    pad_segments, split_segments, merge_segments)
from fnssl_tpu.data.locata import LocataDataset
from fnssl_tpu.data.realman import RealData, collate_realman
from fnssl_tpu.data.loader import DataLoader, prefetch_to_device
