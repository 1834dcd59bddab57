.PHONY: data train predict visualization test lint clean bench download \
	test_environment

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

## Run the test suite
test:
	$(PYTHON_INTERPRETER) -m pytest tests/ -x -q

## Environment sanity check (python3 + jax available)
test_environment:
	$(PYTHON_INTERPRETER) -c "import sys; assert sys.version_info[0] == 3; \
	import jax; print('python3 + jax', jax.__version__, 'OK')"

## Lint
lint:
	$(PYTHON_INTERPRETER) -m flake8 pivp_tpu tests || true

## Benchmark (single JSON line)
bench:
	$(PYTHON_INTERPRETER) bench.py

## Build the native C++ components (TFRecord scanner)
native:
	g++ -O3 -shared -fPIC -msse4.2 native/tfrecord_index.cc \
		-o native/libtfrecord_index.so || \
	g++ -O3 -shared -fPIC native/tfrecord_index.cc \
		-o native/libtfrecord_index.so

## Delete compiled artifacts
clean:
	find . -name "__pycache__" -type d -exec rm -rf {} +
	find . -name "*.pyc" -delete
