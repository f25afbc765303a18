.PHONY: test bench bench-train bench-sync profile trace serve media

media:
	$(MAKE) -C asva_tpu/data/media

test: media
	python -m pytest tests/ -q

bench:
	python bench.py

bench-train:
	python bench.py --train

bench-sync:
	python bench.py --sync

profile:
	python tools/profile_components.py

trace:
	python tools/trace_eval.py

serve:
	python scripts/animation_serve.py --warmup
