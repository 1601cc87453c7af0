# Task runner (reference justfile:95-118 recipe surface, TPU edition).

# run the fast test suite
test:
    python -m pytest tests/ -x -q

# train a config:  just train tutorials/mito_lucchi.yaml [extra overrides...]
train config *args:
    python scripts/main.py --config {{config}} --mode train {{args}}

# test/inference:  just test-model tutorials/mito_lucchi.yaml ckpt [args...]
test-model config checkpoint *args:
    python scripts/main.py --config {{config}} --mode test --checkpoint {{checkpoint}} {{args}}

# decode-parameter tuning
tune config checkpoint *args:
    python scripts/main.py --config {{config}} --mode tune --checkpoint {{checkpoint}} {{args}}

tune-test config checkpoint *args:
    python scripts/main.py --config {{config}} --mode tune-test --checkpoint {{checkpoint}} {{args}}

# resume training from a checkpoint
resume config checkpoint *args:
    python scripts/main.py --config {{config}} --mode train --checkpoint {{checkpoint}} {{args}}

# quick tuning smoke (few trials)
tune-quick config checkpoint *args:
    python scripts/main.py --config {{config}} --mode tune --checkpoint {{checkpoint}} \
        --tune-trials 5 {{args}}

# test with tuned decode params (best_params.yaml from a tune run)
test-with-params config checkpoint params *args:
    python scripts/main.py --config {{config}} --mode test --checkpoint {{checkpoint}} \
        --params {{params}} {{args}}

# quick smoke run (1 epoch x 2 steps)
dev config:
    python scripts/main.py --config {{config}} --mode train --fast-dev-run

# dataset registry: status / fetch
download +datasets:
    python scripts/download_data.py {{datasets}} --fetch

download-list:
    python scripts/download_data.py

# tensorboard over an experiment's output dir
tensorboard experiment port='6006':
    tensorboard --logdir outputs/{{experiment}} --port {{port}}

# SLURM array of independent shards (emits an sbatch script; reference justfile:261)
slurm-sharded config checkpoint num_shards *args:
    python scripts/launcher.py --config {{config}} --checkpoint {{checkpoint}} \
        --num-shards {{num_shards}} --slurm {{args}}

# neuroglancer visualization of volumes
visualize +volumes:
    python scripts/visualize_neuroglancer.py {{volumes}}

# independent-shard inference across N processes (no comm; reference sharding.py:212)
shard config checkpoint shard_id num_shards:
    python scripts/main.py --config {{config}} --mode test --checkpoint {{checkpoint}} \
        --shard-id {{shard_id}} --num-shards {{num_shards}}

# build the native C++ ops library
native:
    g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread csrc/pytc_ops.cpp -o csrc/libpytc_ops.so

# benchmark sliding-window throughput on the local chip
bench:
    python bench.py

# full-pipeline quality benchmark on the attached accelerator:
# on-device synthetic EM task -> train MedNeXt-S -> sliding-window + flip-TTA
# -> Jaccard (appends to QUALITY.md; tracked round-over-round vs Lucchi++ 0.935)
quality *args:
    {{args}} python scripts/quality_benchmark.py

# instance pipeline quality (affinity -> waterz/CC/mutex -> aRand/VOI/AP/NERL);
# IQ_OFFSETS=long adds long-range channels for mutex, IQ_ELONGATION=4 fibers
quality-instance *args:
    {{args}} python scripts/instance_quality_benchmark.py

# blob pipeline quality (binary-contour-distance -> bcd watershed -> COCO AP)
quality-blob *args:
    {{args}} python scripts/blob_quality_benchmark.py
