"""lightctr_tpu — a TPU-native CTR training + scoring framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of the
LightCTR reference framework (cnkuangshi/LightCTR): sparse CTR models
(LR/FM/FFM/NFM Wide&Deep), boosted trees, EM models (GMM/PLSA), word
embeddings, CNN/RNN/VAE parity zoo, data/model parallelism over
`jax.sharding.Mesh`, and an on-TPU MIPS serving path.

Layer map (TPU-native equivalents of the reference layers, see SURVEY.md):
  ops/       -- Pallas kernels + jnp fallbacks     (ref: LightCTR/common/avx.h)
  nn/        -- pure-functional NN modules          (ref: LightCTR/train/layer/)
  optim/     -- optimizer suite                     (ref: LightCTR/util/gradientUpdater.h)
  models/    -- model zoo / trainers                (ref: LightCTR/train/)
  parallel/  -- mesh, shardings, collectives        (ref: LightCTR/distribut/)
  data/      -- libffm/dense loaders + batching     (ref: LightCTR/fm_algo_abst.h loaders)
  train/     -- train loops, checkpointing, config  (ref: main.cpp statics)
  serve/     -- batch scorer + MIPS retrieval       (ref: LightCTR/predict/)
  utils/     -- metrics, compression, stats         (ref: LightCTR/util/)
"""

__version__ = "0.1.0"
