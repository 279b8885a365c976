# One-command gates.  See scripts/check.sh for details and expected runtimes.

.PHONY: check bench native

check:
	bash scripts/check.sh

# real-TPU benchmark (axon tunnel); emits the driver's final JSON line
bench:
	python bench.py

# force-rebuild the native C++ kernel module (normally built on demand by
# snark_verifier_tpu/util/native_ec.py)
native:
	python -c "from snark_verifier_tpu.util import native_ec; native_ec.lib_v2(); print('native module built')"
