"""Model compositions: Mimi codec, LLM backbones, the speech-text LM."""
