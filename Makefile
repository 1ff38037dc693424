.PHONY: tests bench install install-dev docs lint validate

install:
	pip install -e . --no-build-isolation

install-dev:
	pip install -e .[dev] --no-build-isolation

# Mirrors the reference's gate (/root/reference/Makefile:7-10): tests + lint.
# ruff/mypy run when installed (config in pyproject.toml); the stdlib AST gate
# in scripts/lint.py always runs (the build sandbox has no network).
lint:
	python scripts/lint.py
	@if command -v ruff >/dev/null 2>&1; then ruff check cellulus_tpu tests scripts; else echo "ruff not installed; skipped (stdlib gate ran)"; fi
	@if command -v mypy >/dev/null 2>&1; then mypy; else echo "mypy not installed; skipped (stdlib gate ran)"; fi

tests: lint
	python -m pytest tests/ -x -q

bench:
	python bench.py

validate:
	python scripts/validate_quality.py
