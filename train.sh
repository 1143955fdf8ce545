#!/bin/bash
# Convenience launcher (counterpart of the reference's train.sh).
# Usage: ./train.sh [extra apps.train flags...]
set -e
python -m iros20_6d_pose_tracking_tpu.apps.train --config configs/config.yml "$@"
