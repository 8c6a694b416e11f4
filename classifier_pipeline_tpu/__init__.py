"""classifier_pipeline_tpu — TPU-native rebuild of the Cacophony thermal
wildlife classifier pipeline (reference: TheCacophonyProject/classifier-pipeline).

Compute path is JAX/XLA/Pallas; the CPTV codec and record IO are C++.
"""

__version__ = "0.1.0"
