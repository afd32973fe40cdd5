# Developer tasks (the reference's Makefile analog; build is setup.py).

.PHONY: ext test test-fast bench bench-quick golden clean

ext:
	python setup.py build_ext --inplace

test: ext
	python -m pytest tests/ -q

test-fast: ext
	python -m pytest tests/ -q -x -k "not pallas"

bench: ext
	python bench.py

bench-quick: ext
	python bench.py --quick

# regenerate golden outputs from the reference binary (built in /tmp)
golden:
	@test -x /tmp/refbuild/jpeg2png || (cp -r /root/reference /tmp/refbuild \
	    && chmod -R u+w /tmp/refbuild && $(MAKE) -C /tmp/refbuild)
	cd tests/fixtures && ../../tools/make_golden.sh

clean:
	rm -rf build jpeg2png_tpu/io/*.so
