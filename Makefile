# Common developer targets.
.PHONY: test test-all smoke bench native lint install

install:
	pip install -e . --no-build-isolation

# fast tier (default; kernel/mesh-heavy tests excluded via the `heavy`
# marker — see pyproject [tool.pytest.ini_options])
test:
	python -m pytest tests/ -q

# everything, including `heavy` kernel/mesh tests (~10 min on 1 core)
test-all:
	python -m pytest tests/ -q -m ""

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
