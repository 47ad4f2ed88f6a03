"""GSM8K harness helpers (reference: benchmarks/gsm8k/bench_sglang.py —
few-shot prompt construction + last-number answer extraction)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / "benchmarks"))

from accuracy_harness import (  # noqa: E402
    INVALID,
    build_gsm8k_prompts,
    extract_answer_value,
)


class TestAnswerExtraction:
    def test_last_number_wins(self):
        assert extract_answer_value("3 + 4 = 7. The answer is 7") == 7

    def test_comma_separated(self):
        assert extract_answer_value("#### 1,234") == 1234

    def test_float(self):
        assert extract_answer_value("so it costs 2.5 dollars") == 2.5

    def test_negative(self):
        assert extract_answer_value("the delta is -12") == -12

    def test_no_number(self):
        assert extract_answer_value("I don't know") == INVALID

    def test_float_that_is_integral(self):
        # 18.0 must compare equal to a gold of 18
        assert extract_answer_value("18.0") == 18


class TestPromptConstruction:
    LINES = [
        {"question": f"q{i}", "answer": f"work\n#### {i * 10}"}
        for i in range(6)
    ]

    def test_shots_prefix_and_golds(self):
        prompts, golds = build_gsm8k_prompts(self.LINES, 2, num_shots=3)
        assert len(prompts) == len(golds) == 2
        # every prompt carries the same 3 worked examples
        for p in prompts:
            for i in range(3):
                assert f"Question: q{i}\nAnswer: work\n#### {i * 10}" in p
        assert prompts[0].endswith("Question: q3\nAnswer:")
        assert golds == [30, 40]

    def test_question_count_clamped_by_data(self):
        prompts, golds = build_gsm8k_prompts(self.LINES, 100, num_shots=5)
        assert len(prompts) == 1 and golds == [50]
