# Common targets for iros20_6d_pose_tracking_tpu.
.PHONY: test test-fast bench demo native clean realdata-dryrun

realdata-dryrun: ## full real-data protocol chain against a synthetic tree
	python examples/realdata_dryrun.py

test:            ## full hermetic suite (CPU, virtual 8-device mesh)
	python -m pytest tests/ -x -q

test-fast:       ## skip the slow integration tests
	python -m pytest tests/ -x -q -m "not slow"

bench:           ## single-chip tracking benchmark (one JSON line on stdout)
	python bench.py

demo:            ## end-to-end train + track on synthetic data
	python examples/demo_train_and_track.py

demo-hard:       ## DR training + hard-video tracking (~20 min on TPU)
	python examples/demo_train_and_track.py --hard --frames 120 --outdir demo_out_hard

accuracy:        ## 4-object hard-video ADD/ADD-S table (~70 min on TPU)
	python benchmarks/accuracy_suite.py

native:          ## build the C++ data-loading runtime
	python -c "from iros20_6d_pose_tracking_tpu.native.dataload import build; print(build())"

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; \
	rm -f iros20_6d_pose_tracking_tpu/native/libdataload.so
