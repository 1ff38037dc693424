.PHONY: tests bench install docs

install:
	pip install -e . --no-build-isolation

tests:
	python -m pytest tests/ -x -q

bench:
	python bench.py

validate:
	python scripts/validate_quality.py
