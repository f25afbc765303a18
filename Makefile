.PHONY: test bench bench-train media

media:
	$(MAKE) -C asva_tpu/data/media

test: media
	python -m pytest tests/ -q

bench:
	python bench.py

bench-train:
	python bench.py --train
