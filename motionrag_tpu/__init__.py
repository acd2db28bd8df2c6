"""motionrag_tpu — TPU-native retrieval-augmented image-to-video framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MCG-NJU/MotionRAG (reference: /root/reference): retrieve reference videos by
text-embedding similarity, adapt their motion with a causal transformer
(CAMA), and inject the adapted motion features into frozen video-diffusion
backbones (SVD / DynamiCrafter / CogVideoX) through small trainable adapter
attention branches.

Subpackages
-----------
- ``ops``       Pallas TPU kernels + XLA compute primitives (flash attention,
                fused GroupNorm, RoPE, top-k retrieval, ...).
- ``models``    Flax model definitions: CAMA stack, encoders, and the three
                diffusion backbones with explicit adapter branches.
- ``rag``       HBM-resident GEMM + top-k retrieval index and database API
                (replaces the reference's LanceDB dependency).
- ``data``      Host-side data pipeline: native libav video decode, datasets,
                clip-selection curation, async device feeding.
- ``metrics``   FVD / FID / DINO / CLIP / ActionScore / Motion-KL evaluation.
- ``training``  Trainer loop, optimizer masking, LoRA, EMA, incremental
                (trainable-only) checkpoints, callbacks.
- ``parallel``  Mesh construction, sharding rules, collectives.
- ``utils``     Video IO-independent tensor utilities and visualization.
"""

__version__ = "0.1.0"
