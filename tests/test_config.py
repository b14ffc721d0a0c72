"""F11: config parse with TryParse-fallback semantics."""

import pytest

from vector_search_ai_assistant_mongodbvcore_spark.config import EngineConfig, try_parse_int


@pytest.mark.parametrize(
    "value,expected",
    [
        ("10", 10),
        (" 42 ", 42),
        ("-5", -5),
        ("", 99),
        (None, 99),
        ("3.5", 99),
        ("ten", 99),
        (7, 7),
        (True, 99),  # C# TryParse("True") fails too
    ],
)
def test_try_parse_int(value, expected):
    assert try_parse_int(value, 99) == expected


def test_defaults_match_reference_fallbacks():
    cfg = EngineConfig()
    assert cfg.max_vector_search_results == 10  # MongoDbService.cs:56
    assert cfg.max_conversation_tokens == 100  # OpenAiService.cs:91
    assert cfg.max_completion_tokens == 500  # OpenAiService.cs:92
    assert cfg.max_embedding_tokens == 8000  # OpenAiService.cs:93
    assert cfg.ivf_num_lists == 2  # MongoDbService.cs:158


def test_from_dict_string_settings():
    cfg = EngineConfig.from_dict(
        {
            "max_vector_search_results": "25",
            "max_completion_tokens": "garbage",
            "vector_index_type": " HNSW ",
            "collection_names": "products, customers, salesOrders, completions",
        }
    )
    assert cfg.max_vector_search_results == 25
    assert cfg.max_completion_tokens == 500  # fallback on junk
    assert cfg.vector_index_type == "hnsw"
    assert cfg.collection_names == ("products", "customers", "salesOrders", "completions")


def test_from_env(monkeypatch):
    monkeypatch.setenv("VSAI_MAX_CONVERSATION_TOKENS", "1000")
    monkeypatch.setenv("VSAI_MAX_EMBEDDING_TOKENS", "not-a-number")
    cfg = EngineConfig.from_env()
    assert cfg.max_conversation_tokens == 1000
    assert cfg.max_embedding_tokens == 8000
