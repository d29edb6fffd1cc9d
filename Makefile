# Experiment automation — parity with the reference's Makefile / makefiles/*.mk
# (make siren :40-43, make prune :48-52, finals.compress.% finals.mk:3-11,
# vis.* visualization.mk). SLURM fan-out is replaced by single-program
# batched fits (parallel/) and plain loops; see scripts/.

PY ?= python
IMG ?= synthetic
DENSITIES ?= 0.01,0.02,0.05,0.1,0.2,0.3,0.4,0.5,0.75,0.95

.PHONY: test test-all bench siren prune sweep target decode meta fleet sequence sequence.decode vis.rate_distortion vis.width_depth vis.weight_removal vis.jpeg finals.compress.% finals.real verify.benchmarks

# default gate: excludes tests marked `slow` (heavyweight redundancy /
# finals-protocol checks); measured 5m25s on a 1-core box. `make test-all`
# is the full gate (~11 min) — run it before release-grade changes.
test:
	$(PY) -m pytest tests/ -q -m "not slow"

test-all:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

# decode a compressed run dir back to an image (RUN=outputs/<img>/<exp>)
decode:
	$(PY) -m implicit_image_tpu.decompress $(RUN)

# dense SIREN fit (reference `make siren`)
siren:
	$(PY) -m implicit_image_tpu.compress img=$(IMG) masking=none quant=none

# sparse training (reference `make prune`)
prune:
	$(PY) -m implicit_image_tpu.compress img=$(IMG) masking=RigL masking.density=0.5

# density-ladder finals per image: zstd + 5x train (finals.mk:3-11)
finals.compress.%:
	$(PY) -m implicit_image_tpu.compress -m img=$* entropy_coding=zstd \
	    train.multiplier=5 masking=RigL masking.density=$(DENSITIES)

# same ladder as ONE vmapped program (one compile, all densities at once);
# the TPU-native replacement for the per-density multirun above
ladder.%:
	$(PY) -m implicit_image_tpu.parallel.ladder img=$* entropy_coding=zstd \
	    train.multiplier=5 masking=RigL masking.density=$(DENSITIES)

sweep:
	$(PY) -m implicit_image_tpu.sweep n_trials=15 img=$(IMG) \
	    masking.density='loguniform(0.05,0.95)'

# meta-learned warm-start artifact (training/metainit.py); consume it in
# any fit with train.init_path=<OUT>
META_OUT ?= outputs/meta/$(IMG).npz
meta:
	$(PY) -m implicit_image_tpu.meta_train img=$(IMG) meta.out=$(META_OUT)

# fleet encode: many images as ONE compiled program (IMAGES=a,b,c);
# members land in standard decodable run dirs
IMAGES ?= flower,big_building,bridge
fleet:
	$(PY) -m implicit_image_tpu.fleet fleet.images=$(IMAGES)

# sequence (video) encode: I-frame + delta-coded P-frames
# (implicit_image_tpu/sequence.py); VIDEO names the synthetic stand-in,
# or pass sequence.files=f0.png,f1.png,... as extra args
VIDEO ?= seqbench
sequence:
	$(PY) -m implicit_image_tpu.sequence sequence.video=$(VIDEO) \
	    quant=kmeans entropy_coding=auto

sequence.decode:
	$(PY) -m implicit_image_tpu.sequence decode $(SEQ_DIR)

# compress to a byte budget (TARGET_BYTES=) or quality bar (TARGET_DB=):
# one-compile ladder search on the density axis (implicit_image_tpu/target.py)
target:
	$(PY) -m implicit_image_tpu.target img=$(IMG) \
	    $(if $(TARGET_BYTES),target.bytes=$(TARGET_BYTES)) \
	    $(if $(TARGET_DB),target.db=$(TARGET_DB))

# validate the rgb16bit drop-in files against data/MANIFEST.json
# (format + sha256, trust-on-first-use)
verify.benchmarks:
	$(PY) tools/verify_benchmarks.py

# FULL real-image finals reproduction, unattended: requires the rgb16bit
# files (data/MANIFEST.json). Validates them, runs the realimage pytest
# suite, then the one-compile finals ladder (5x train + kmeans-8 + auto
# coding + decode) per benchmark image, then the R-D overlay plots.
# Dropping the three files into data/rgb16bit/ is the ONLY setup step.
finals.real:
	$(PY) tools/verify_benchmarks.py --require-all
	$(PY) -m pytest tests/test_realimage.py -q -m "realimage and not slow"
	for img in flower big_building bridge; do \
	    $(PY) -m implicit_image_tpu.parallel.ladder img=$$img \
	        entropy_coding=auto quant=kmeans train.multiplier=5 \
	        masking=RigL masking.density=$(DENSITIES) \
	        exp_name=finals_real || exit 1; \
	done
	for img in flower big_building bridge; do \
	    $(PY) -m implicit_image_tpu.visualize.rate_distortion img=$$img || exit 1; \
	done

vis.rate_distortion:
	$(PY) -m implicit_image_tpu.visualize.rate_distortion img=$(IMG)

vis.width_depth:
	$(PY) -m implicit_image_tpu.visualize.width_depth

vis.weight_removal:
	$(PY) -m implicit_image_tpu.visualize.weight_removal

vis.jpeg:
	$(PY) -m implicit_image_tpu.visualize.jpeg_quality_curve

# per-frame quality/rate curve for a sequence run (SEQ_DIR=outputs/seq_<name>)
vis.sequence:
	$(PY) -m implicit_image_tpu.visualize.sequence_curve $(SEQ_DIR)
