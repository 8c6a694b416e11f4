#!/bin/sh
# container readiness probe (reference docker/ready.sh)
exec python -m classifier_pipeline_tpu.services.classifyjob --ready
