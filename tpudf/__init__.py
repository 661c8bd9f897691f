"""tpudf — TPU-native deepfake-detection framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of the reference
SigLIP-2 deepfake detection system (see SURVEY.md): frozen-backbone
classification training, multi-task tamper localization, video classification,
multi-expert fused inference (SigLIP visual expert + frequency expert + fusion
head + CORAL ordinal calibration + forensic battery + Bayesian/Dirichlet
evidence fusion), and evaluation tooling.

Layering (mirrors SURVEY.md §7):
  core/      mesh + sharding setup, precision policy, env config
  ops/       pallas attention; JAX forensic ops (fft24, srm, dwt, dct8, prnu, cfa, jpeg)
  models/    siglip ViT, heads (binary/freq/fusion), MTL decoder, video classifier
  data/      host decode + device-resident preprocessing/augmentation graphs
  calib/     CORAL, temperature/platt/isotonic, threshold search
  fuse/      bayesian fusion, decision policy, video aggregation, temporal signals
  train/     optax training loops (binary / freq / fusion / MTL / video)
  eval/      metrics, bootstrap/statistics, calibration diagnostics
  serve/     batched inference engine (multicrop+TTA+patch-grid in one device batch)
  parallel/  pjit/shard_map multi-chip entry points
"""

__version__ = "0.1.0"
