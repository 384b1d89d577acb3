"""Generate examples/input-test.txt — 63 timestamped "hello world" lines,
1 s apart (the shape of the reference's e2e golden corpus, which the
reference itself produces with dev/tools/create-test-file.sh; generated
here rather than copied, with a distinct start instant for provenance).

Run:  python -m examples.make_input_test
"""
import datetime
import os

START = datetime.datetime(2024, 1, 1, 0, 0, 0)

if __name__ == "__main__":
    path = os.path.join(os.path.dirname(__file__), "input-test.txt")
    with open(path, "w") as f:
        for i in range(63):
            ts = (START + datetime.timedelta(seconds=i)).strftime("%Y-%m-%d %H:%M:%S")
            f.write(f"{ts} hello world\n")
    print(f"wrote 63 lines -> {path}")
