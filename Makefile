help: ## Show this help.
	@grep -E '^[a-zA-Z%_-]+:.*?## .*$$' $(MAKEFILE_LIST) | awk 'BEGIN {FS = ":.*?## "}; {printf "\033[36m%-30s\033[0m %s\n", $$1, $$2}'

test: ## Run all tests (virtual 8-device CPU mesh)
	@python3 -m pytest tests/ -q

bench: ## Run the training-throughput benchmark (one JSON line)
	@python3 bench.py

train-predict: ## End-to-end smoke: train a tiny model, predict, resume-retrain
	@bash train.sh
	@bash predict.sh
	@bash retrain.sh

lint: ## Format with black + isort if available
	@python3 -m black graphphysics_tpu/ tests/ 2>/dev/null || true
	@python3 -m isort graphphysics_tpu/ tests/ --profile black 2>/dev/null || true
