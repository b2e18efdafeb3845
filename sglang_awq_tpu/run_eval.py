"""Accuracy eval harness: MMLU (multichoice) and few-shot GSM-8K.

Role model: reference `python/sglang/test/run_eval.py` +
`simple_eval_mmlu.py` (simple-evals prompt format, ANSWER_PATTERN
extraction) and `few_shot_gsm8k.py` (5-shot prompt, last-number answer
extraction, INVALID sentinel).

Zero-egress adaptation: datasets load from LOCAL files —
  mmlu : csv with columns question,A,B,C,D,answer  (the standard
         mmlu.csv from openai/simple-evals; download out of band)
  gsm8k: jsonl with {"question": ..., "answer": ...} (test.jsonl)
`--data-path synthetic` runs a built-in toy set (pipeline smoke test —
NOT an accuracy measurement).

Usage:
  python -m sglang_awq_tpu.run_eval --eval-name mmlu \
      --data-path mmlu.csv --host 127.0.0.1 --port 30000 \
      --num-questions 200 --parallel 16
"""

from __future__ import annotations

import argparse
import ast
import concurrent.futures
import csv
import json
import re
import sys
import time

ANSWER_PATTERN_MULTICHOICE = r"(?i)Answer[ \t]*:[ \t]*\$?([A-D])"
INVALID = -9999999

QUERY_TEMPLATE_MULTICHOICE = """
Answer the following multiple choice question. The last line of your response should be of the following format: 'Answer: $LETTER' (without quotes) where LETTER is one of ABCD. Think step by step before answering.

{question}

A) {A}
B) {B}
C) {C}
D) {D}
""".strip()

SYNTHETIC_MMLU = [
    dict(question="What is 2 + 2?", A="3", B="4", C="5", D="22", answer="B"),
    dict(question="Which planet is closest to the sun?",
         A="Venus", B="Earth", C="Mercury", D="Mars", answer="C"),
    dict(question="What color results from mixing blue and yellow paint?",
         A="Green", B="Purple", C="Orange", D="Brown", answer="A"),
]

SYNTHETIC_GSM8K = [
    dict(question="Tom has 3 apples and buys 2 more. How many apples does "
                  "he have?", answer="Tom starts with 3 and adds 2. "
                  "3 + 2 = 5. The answer is 5"),
    dict(question="A book costs 4 dollars. How much do 3 books cost?",
         answer="Each book is 4 dollars so 3 books cost 3 * 4 = 12. "
                "The answer is 12"),
    dict(question="Sara had 10 candies and ate 4. How many are left?",
         answer="10 - 4 = 6. The answer is 6"),
    dict(question="There are 7 days in a week. How many days in 2 weeks?",
         answer="7 * 2 = 14. The answer is 14"),
    dict(question="A farm has 5 cows and 6 sheep. How many animals?",
         answer="5 + 6 = 11. The answer is 11"),
    dict(question="Jack ran 2 miles a day for 3 days. How many miles?",
         answer="2 * 3 = 6. The answer is 6"),
]


def _post(host, port, path, body, timeout=600):
    import httpx

    r = httpx.post(f"http://{host}:{port}{path}", json=body, timeout=timeout)
    r.raise_for_status()
    return r.json()


# ---------------------------------------------------------------------------
# MMLU
# ---------------------------------------------------------------------------


def load_mmlu(path):
    if path == "synthetic":
        return list(SYNTHETIC_MMLU)
    rows = []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            rows.append(row)
    return rows


def eval_mmlu(args, port=None) -> dict:
    rows = load_mmlu(args.data_path)[: args.num_questions]
    port = port or args.port

    def one(row):
        prompt = QUERY_TEMPLATE_MULTICHOICE.format(**row)
        out = _post(
            args.host, port, "/v1/chat/completions",
            {
                "model": "default",
                "messages": [{"role": "user", "content": prompt}],
                "temperature": 0.0,
                "max_tokens": args.max_tokens,
            },
        )
        text = out["choices"][0]["message"]["content"] or ""
        m = re.search(ANSWER_PATTERN_MULTICHOICE, text)
        pred = m.group(1).upper() if m else None
        return (
            1.0 if pred == str(row["answer"]).strip().upper() else 0.0,
            pred,
        )

    results = _run_parallel(one, rows, args.parallel)
    scores = [r[0] for r in results]
    return {
        "eval": "mmlu", "n": len(scores),
        "score": sum(scores) / max(len(scores), 1),
        "preds": [r[1] for r in results],
    }


# ---------------------------------------------------------------------------
# GSM-8K (few-shot, reference few_shot_gsm8k.py format)
# ---------------------------------------------------------------------------


def get_answer_value(answer_str: str):
    answer_str = answer_str.replace(",", "")
    numbers = re.findall(r"\d+", answer_str)
    if len(numbers) < 1:
        return INVALID
    try:
        return ast.literal_eval(numbers[-1])
    except (SyntaxError, ValueError):
        return INVALID


def load_gsm8k(path):
    if path == "synthetic":
        return list(SYNTHETIC_GSM8K)
    lines = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                lines.append(json.loads(line))
    return lines


def eval_gsm8k(args, port=None) -> dict:
    port = port or args.port
    lines = load_gsm8k(args.data_path)
    k = min(args.num_shots, max(len(lines) - 1, 0))
    few_shot = ""
    for i in range(k):
        few_shot += (
            f"Question: {lines[i]['question']}\nAnswer: {lines[i]['answer']}\n\n"
        )
    qs = lines[k:][: args.num_questions]

    def one(line):
        prompt = few_shot + f"Question: {line['question']}\nAnswer:"
        out = _post(
            args.host, port, "/generate",
            {
                "text": prompt,
                "sampling_params": {
                    "max_new_tokens": args.max_tokens,
                    "temperature": 0.0,
                    "stop": ["Question", "Assistant:", "<|separator|>"],
                },
            },
        )
        pred = get_answer_value(out["text"])
        gold = get_answer_value(line["answer"])
        return (1.0 if pred == gold and gold != INVALID else 0.0, pred)

    results = _run_parallel(one, qs, args.parallel)
    scores = [r[0] for r in results]
    return {
        "eval": "gsm8k", "n": len(scores),
        "score": sum(scores) / max(len(scores), 1),
        "preds": [r[1] for r in results],
    }


def _run_parallel(fn, items, parallel):
    with concurrent.futures.ThreadPoolExecutor(max_workers=parallel) as ex:
        return list(ex.map(fn, items))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-name", choices=["mmlu", "gsm8k"], required=True)
    ap.add_argument("--data-path", default="synthetic",
                    help="csv (mmlu) / jsonl (gsm8k) file, or 'synthetic'")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=30000)
    ap.add_argument("--num-questions", type=int, default=200)
    ap.add_argument("--num-shots", type=int, default=5)
    ap.add_argument("--max-tokens", type=int, default=512)
    ap.add_argument("--parallel", type=int, default=16)
    ap.add_argument(
        "--compare-port", type=int, default=0,
        help="second server (e.g. the bf16 baseline): report both scores "
             "plus answer agreement — the quantize-and-serve quality check",
    )
    args = ap.parse_args(argv)

    fn = eval_mmlu if args.eval_name == "mmlu" else eval_gsm8k
    t0 = time.time()
    result = fn(args)
    preds = result.pop("preds")
    if args.compare_port:
        base = fn(args, port=args.compare_port)
        bpreds = base.pop("preds")
        agree = [
            1.0 for a, b in zip(preds, bpreds)
            if a == b and a is not None
        ]
        result = {
            "eval": result["eval"], "n": result["n"],
            "score": result["score"],
            "baseline_score": base["score"],
            "score_delta": round(result["score"] - base["score"], 4),
            "answer_agreement": round(len(agree) / max(result["n"], 1), 4),
        }
    result["latency_s"] = round(time.time() - t0, 2)
    if args.data_path == "synthetic":
        result["note"] = "synthetic smoke set — NOT a benchmark score"
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
