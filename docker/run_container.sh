#!/bin/bash
# Launch the framework container with TPU access (counterpart of the
# reference's docker/run_container.sh).
docker run -it --rm --privileged --network host \
  -v "$(pwd)":/workspace -v /data:/data \
  iros20_6d_pose_tracking_tpu:latest "$@"
