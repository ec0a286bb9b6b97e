# Common developer targets.
.PHONY: test smoke bench native lint install

install:
	pip install -e . --no-build-isolation

test:
	python -m pytest tests/ -q

smoke:
	bash scripts/smoke.sh

bench:
	python bench.py

native:
	g++ -O3 -shared -fPIC -std=c++17 \
	  archi_tpu/native/text_analyzer.cc \
	  -o archi_tpu/native/libtext_analyzer.so

graft-check:
	python __graft_entry__.py
