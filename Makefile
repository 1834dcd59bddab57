.PHONY: data train predict visualization test lint clean bench download \
	test_environment requirements create_environment sync_data_to_s3 \
	sync_data_from_s3 bench_matrix bench_inference bench_input \
	bench_serving convergence native

# Build orchestration with the same public targets as the reference
# Makefile (/root/reference/Makefile:27-79), TPU-native entry points.

PYTHON_INTERPRETER = python
ARGS ?=

## Download the robot-push tfrecord shards
download:
	$(PYTHON_INTERPRETER) -m pivp_tpu.data.download $(ARGS)

## Make the processed dataset from raw tfrecords
data:
	$(PYTHON_INTERPRETER) -m pivp_tpu.data.make_dataset_cli $(ARGS)

## Train the model
train:
	$(PYTHON_INTERPRETER) -m pivp_tpu.training.train_cli $(ARGS)

## Predict frames from a trained model
predict:
	$(PYTHON_INTERPRETER) -m pivp_tpu.inference.predict_cli $(ARGS)

## Visualize loss curves / layer activations
visualization:
	$(PYTHON_INTERPRETER) -m pivp_tpu.visualization.visualize_cli $(ARGS)

## Run the fast test suite (excludes tests marked heavy; <10 min on a
## 1-core host). Use test_all before shipping.
test:
	$(PYTHON_INTERPRETER) -m pytest tests/ -x -q -m "not heavy"

## Run the FULL test suite, including the heavy full-model training and
## parity gates (~1 h on a 1-core host).
test_all:
	$(PYTHON_INTERPRETER) -m pytest tests/ -x -q

## Install Python dependencies (reference Makefile:23-24). The TPU image
## ships jax/flax/optax pre-installed; this validates they import.
requirements: test_environment
	$(PYTHON_INTERPRETER) -m pip install -e . --no-deps --quiet || true
	$(PYTHON_INTERPRETER) -c "import jax, numpy, click, PIL; print('deps OK')"

## Set up a python environment (reference Makefile:46-57). venv-based —
## pyenv is not assumed on TPU hosts.
create_environment:
	$(PYTHON_INTERPRETER) -m venv .venv && \
	echo ">>> venv created. Activate with: source .venv/bin/activate"

BUCKET ?= your-bucket-for-syncing-data

## Upload data to S3 (reference Makefile:38-40); uses gsutil when aws is
## absent (the robot-push source bucket is GCS).
sync_data_to_s3:
	@if command -v aws >/dev/null; then aws s3 sync data/ s3://$(BUCKET)/data/; \
	elif command -v gsutil >/dev/null; then gsutil -m rsync -r data/ gs://$(BUCKET)/data/; \
	else echo "no aws/gsutil CLI available" && exit 1; fi

## Download data from S3 (reference Makefile:42-44)
sync_data_from_s3:
	@if command -v aws >/dev/null; then aws s3 sync s3://$(BUCKET)/data/ data/; \
	elif command -v gsutil >/dev/null; then gsutil -m rsync -r gs://$(BUCKET)/data/ data/; \
	else echo "no aws/gsutil CLI available" && exit 1; fi

## Environment sanity check (python3 + jax available)
test_environment:
	$(PYTHON_INTERPRETER) -c "import sys; assert sys.version_info[0] == 3; \
	import jax; print('python3 + jax', jax.__version__, 'OK')"

## Lint
lint:
	$(PYTHON_INTERPRETER) tools/lint.py pivp_tpu tests tools bench.py __graft_entry__.py

## Benchmark (single JSON line)
bench:
	$(PYTHON_INTERPRETER) bench.py

## Benchmark matrix over the CDNA/DNA/STP configs
bench_matrix:
	$(PYTHON_INTERPRETER) tools/bench_matrix.py

## Inference/serving throughput benchmark
bench_inference:
	$(PYTHON_INTERPRETER) tools/bench_inference.py

## Serving-batch scaling sweep through the export artifact (MFU table)
bench_serving:
	$(PYTHON_INTERPRETER) tools/bench_serving.py

## Loss-convergence study (regenerates notebooks/4.0-loss-convergence.md)
convergence:
	$(PYTHON_INTERPRETER) tools/convergence_study.py

## Build the native C++ components (TFRecord scanner, batch assembler)
native:
	g++ -O3 -shared -fPIC -msse4.2 native/tfrecord_index.cc \
		-o native/libtfrecord_index.so || \
	g++ -O3 -shared -fPIC native/tfrecord_index.cc \
		-o native/libtfrecord_index.so
	g++ -O3 -shared -fPIC -fopenmp native/batch_assembler.cc \
		-o native/libbatch_assembler.so || \
	g++ -O3 -shared -fPIC native/batch_assembler.cc \
		-o native/libbatch_assembler.so

## Host-side K-dispatch batch-assembly benchmark (native vs numpy)
bench_input:
	$(PYTHON_INTERPRETER) tools/bench_input_assembly.py

## Delete compiled artifacts
clean:
	find . -name "__pycache__" -type d -exec rm -rf {} +
	find . -name "*.pyc" -delete
