"""Deterministic raw_edu fixture generator (seed=42).

Schemas transcribed from the reference's source DDL
(DEDP/dbt_project.yml:20-162) per FIXTURES.md §A, with the generator
constraints that make every model/test path reachable: full grade
alphabet, shared (course, semester) enrollment pairs for the
collaboration self-join, acyclic prerequisite chains (depth ≤ 5),
exactly one current semester, nulls at realistic rates, referential
closure.
"""

from __future__ import annotations

from datetime import date, datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

RUN_DATE = date(2024, 10, 15)  # frozen clock (SURVEY §4 deterministic time)

GRADES = ["A+", "A", "A-", "B+", "B", "B-", "C+", "C", "C-", "D+", "D", "D-", "F",
          "WF", "W", "I"]
GRADE_POINTS = {
    "A+": 4.0, "A": 4.0, "A-": 3.7, "B+": 3.3, "B": 3.0, "B-": 2.7,
    "C+": 2.3, "C": 2.0, "C-": 1.7, "D+": 1.3, "D": 1.0, "D-": 0.7,
    "F": 0.0, "WF": 0.0, "W": None, "I": None,
}
POSITIONS = ["Professor", "Associate Professor", "Assistant Professor", "Lecturer"]
ASSIGNMENT_TYPES = [
    "Midterm Exam", "Final TEST", "Group Project", "Homework Set", "weekly HW",
    "Pop Quiz", "Discussion Board", "Class Presentation", "Lab Report",
]
AID_TYPES = ["Merit Scholarship", "Pell GRANT", "Student Loan", "Work Study",
             "Athletic scholarship", "federal grant", "private LOAN", "Stipend"]
PAY_METHODS = ["Credit Card", "personal CHECK", "bank transfer", "ACH payment",
               "CASH", "debit card", "wire Transfer"]


def _ts(rng: np.random.RandomState, n: int) -> list[datetime]:
    base = datetime(2023, 1, 1)
    return [base + timedelta(seconds=int(s)) for s in rng.randint(0, 3.0e7, n)]


def generate_raw_edu(
    n_students: int = 200,
    n_courses: int = 40,
    n_departments: int = 8,
    n_faculty: int = 25,
    seed: int = 42,
) -> dict[str, pd.DataFrame]:
    rng = np.random.RandomState(seed)
    out: dict[str, pd.DataFrame] = {}

    # -- semesters: 8, Fall/Spring/Summer mix, exactly one current -----
    sem_rows = []
    sid = 1
    for year in (2022, 2023, 2024):
        for name, (sm, sd_, em, ed_) in (
            ("Spring", (1, 16, 5, 10)),
            ("Summer", (6, 1, 7, 28)),
            ("Fall", (8, 26, 12, 15)),
        ):
            start, end = date(year, sm, sd_), date(year, em, ed_)
            sem_rows.append(
                dict(
                    semester_id=sid,
                    semester_name=f"{name} {year}",
                    academic_year=f"{year}-{year + 1}" if sm >= 8 else f"{year - 1}-{year}",
                    start_date=start,
                    end_date=end,
                    is_current=bool(start <= RUN_DATE <= end),
                    created_at=datetime(year, 1, 1),
                )
            )
            sid += 1
    semesters = pd.DataFrame(sem_rows)
    assert semesters["is_current"].sum() == 1
    n_semesters = len(semesters)
    out["semesters"] = semesters

    # -- departments --------------------------------------------------
    out["departments"] = pd.DataFrame(
        dict(
            department_id=np.arange(1, n_departments + 1),
            department_name=[f"Department {i}" for i in range(1, n_departments + 1)],
            department_code=[f"D{i:02d}" for i in range(1, n_departments + 1)],
            head_faculty_id=[
                int(rng.randint(1, n_faculty + 1)) if rng.rand() > 0.15 else None
                for _ in range(n_departments)
            ],
            budget=np.round(rng.uniform(0.5e6, 5e6, n_departments), 2),
            building_location=[f"Building {chr(65 + i % 6)}" for i in range(n_departments)],
            created_at=_ts(rng, n_departments),
        )
    )

    # -- faculty -------------------------------------------------------
    out["faculty"] = pd.DataFrame(
        dict(
            faculty_id=np.arange(1, n_faculty + 1),
            first_name=[f"Fac{i}" for i in range(1, n_faculty + 1)],
            last_name=[f"Prof{i}" for i in range(1, n_faculty + 1)],
            email=[
                f"fac{i}@uni.edu" if rng.rand() > 0.1 else None
                for i in range(1, n_faculty + 1)
            ],
            department_id=rng.randint(1, n_departments + 1, n_faculty),
            position=rng.choice(POSITIONS, n_faculty),
            salary=np.round(rng.uniform(50_000, 120_000, n_faculty), 2),
            hire_date=[
                date(2000, 1, 1) + timedelta(days=int(d))
                for d in rng.randint(0, 8500, n_faculty)
            ],
            office_number=[f"R{100 + i}" for i in range(n_faculty)],
            research_interests=[
                list(rng.choice(["ml", "db", "hci", "theory", "systems"],
                                rng.randint(1, 4), replace=False))
                for _ in range(n_faculty)
            ],
            created_at=_ts(rng, n_faculty),
        )
    )

    # -- courses: acyclic prereq chains of depth ≤ 5 -------------------
    prereq: list[int | None] = []
    for cid in range(1, n_courses + 1):
        if cid > 5 and rng.rand() < 0.4:
            prereq.append(int(rng.randint(max(1, cid - 6), cid)))  # earlier course
        else:
            prereq.append(None)
    out["courses"] = pd.DataFrame(
        dict(
            course_id=np.arange(1, n_courses + 1),
            course_code=[f"C{i:03d}" for i in range(1, n_courses + 1)],
            course_name=[f"Course {i}" for i in range(1, n_courses + 1)],
            description=[
                f"About course {i}" if rng.rand() > 0.2 else None
                for i in range(1, n_courses + 1)
            ],
            credits=rng.randint(1, 6, n_courses),
            department_id=rng.randint(1, n_departments + 1, n_courses),
            prerequisite_course_id=prereq,
            difficulty_level=rng.randint(1, 6, n_courses),
            created_at=_ts(rng, n_courses),
        )
    )

    # -- students ------------------------------------------------------
    statuses = rng.choice(
        ["active", "graduated", "dropped", "suspended"], n_students,
        p=[0.65, 0.2, 0.1, 0.05],
    )
    grad_dates = [
        date(2024, 5, 20) if s == "graduated" else None for s in statuses
    ]
    out["students"] = pd.DataFrame(
        dict(
            student_id=np.arange(1, n_students + 1),
            # student 7 has a NULL last_name so the `||` NULL propagation
            # in full_name (stg_students.sql:8) is actually exercised
            first_name=[f"First{i}" for i in range(1, n_students + 1)],
            last_name=[
                f"Last{i}" if i != 7 else None for i in range(1, n_students + 1)
            ],
            email=[
                f"s{i}@uni.edu" if rng.rand() > 0.05 else None
                for i in range(1, n_students + 1)
            ],
            date_of_birth=[
                date(1998, 1, 1) + timedelta(days=int(d))
                for d in rng.randint(0, 2900, n_students)
            ],
            enrollment_date=[
                date(2020, 8, 1) + timedelta(days=int(d))
                for d in rng.randint(0, 1500, n_students)
            ],
            graduation_date=grad_dates,
            student_status=statuses,
            gpa=np.round(rng.uniform(0.0, 4.0, n_students), 2),
            major_id=[
                int(rng.randint(1, n_departments + 1)) if rng.rand() > 0.1 else None
                for _ in range(n_students)
            ],
            advisor_id=[
                int(rng.randint(1, n_faculty + 1)) if rng.rand() > 0.2 else None
                for _ in range(n_students)
            ],
            address_id=[
                int(rng.randint(1, 1000)) if rng.rand() > 0.3 else None
                for _ in range(n_students)
            ],
            created_at=_ts(rng, n_students),
        )
    )

    # -- enrollments: guarantee shared (course, semester) cohorts ------
    rows = []
    eid = 1
    offered = [
        (c, s)
        for c in range(1, n_courses + 1)
        for s in range(1, n_semesters + 1)
        if rng.rand() < 0.5
    ]
    for stu in range(1, n_students + 1):
        n_enr = rng.randint(4, 14)
        for _ in range(n_enr):
            c, s = offered[rng.randint(0, len(offered))]
            sem = sem_rows[s - 1]
            enr_date = sem["start_date"] + timedelta(days=int(rng.randint(-14, 20)))
            completed = sem["end_date"] < RUN_DATE and rng.rand() < 0.85
            grade = rng.choice(GRADES, p=_grade_probs()) if completed else (
                rng.choice(["W", "I", None], p=[0.05, 0.05, 0.9])
            )
            gp = GRADE_POINTS.get(grade) if grade is not None else None
            rows.append(
                dict(
                    enrollment_id=eid,
                    student_id=stu,
                    course_id=c,
                    semester_id=s,
                    enrollment_date=enr_date,
                    completion_date=sem["end_date"] if completed else None,
                    grade=grade,
                    grade_points=gp,
                    attendance_percentage=round(float(rng.uniform(40, 100)), 2),
                    created_at=datetime.combine(enr_date, datetime.min.time()),
                )
            )
            eid += 1
    enrollments = pd.DataFrame(rows).drop_duplicates(
        subset=["student_id", "course_id", "semester_id"], keep="first"
    )
    out["enrollments"] = enrollments

    # -- class sessions ------------------------------------------------
    srows = []
    ssid = 1
    for c, s in offered:
        if rng.rand() < 0.6:
            continue
        sem = sem_rows[s - 1]
        for _ in range(rng.randint(1, 4)):
            d = sem["start_date"] + timedelta(days=int(rng.randint(0, 80)))
            srows.append(
                dict(
                    session_id=ssid,
                    course_id=c,
                    faculty_id=int(rng.randint(1, n_faculty + 1)),
                    semester_id=s,
                    session_time=f"{int(rng.randint(8, 23)):02d}:00:00",
                    session_date=d,
                    room_id=int(rng.randint(1, 30)),
                    attendance_count=int(rng.randint(5, 60)),
                    created_at=datetime.combine(d, datetime.min.time()),
                )
            )
            ssid += 1
    out["class_sessions"] = pd.DataFrame(srows)

    # -- assignments + submissions ------------------------------------
    arows, subrows = [], []
    aid_, subid = 1, 1
    enr_by_cs = enrollments.groupby(["course_id", "semester_id"])["student_id"]
    for (c, s), students_in in enr_by_cs:
        for _ in range(rng.randint(1, 4)):
            due = RUN_DATE + timedelta(days=int(rng.randint(-60, 60)))
            arows.append(
                dict(
                    assignment_id=aid_,
                    course_id=c,
                    semester_id=s,
                    assignment_name=f"Assignment {aid_}",
                    assignment_type=str(rng.choice(ASSIGNMENT_TYPES)),
                    due_date=due,
                    max_points=round(float(rng.uniform(10, 200)), 2),
                    weight_percentage=round(float(rng.uniform(0, 40)), 2),
                    created_at=datetime(2024, 1, 1),
                )
            )
            for stu in students_in.values[: rng.randint(1, len(students_in) + 1)]:
                r = rng.rand()
                score = (
                    None if r < 0.1 else (0.0 if r < 0.15 else round(float(rng.uniform(1, 100)), 2))
                )
                subrows.append(
                    dict(
                        submission_id=subid,
                        assignment_id=aid_,
                        student_id=int(stu),
                        submission_date=datetime.combine(
                            due - timedelta(days=int(rng.randint(0, 5))),
                            datetime.min.time(),
                        ),
                        score=score,
                        late_submission=bool(rng.rand() < 0.2),
                        feedback=str(
                            rng.choice(["Good work", "", "  ", None], p=[0.5, 0.15, 0.1, 0.25])
                        )
                        if rng.rand() < 0.99
                        else None,
                        created_at=datetime(2024, 1, 2),
                    )
                )
                subid += 1
            aid_ += 1
    out["assignments"] = pd.DataFrame(arows)
    subs = pd.DataFrame(subrows)
    subs.loc[subs["feedback"] == "None", "feedback"] = None
    out["assignment_submissions"] = subs

    # -- financial aid: ~40% of students have no aid rows --------------
    frows = []
    fid = 1
    for stu in range(1, n_students + 1):
        if rng.rand() < 0.4:
            continue
        for _ in range(rng.randint(1, 4)):
            dd = date(2023, 1, 1) + timedelta(days=int(rng.randint(0, 700)))
            frows.append(
                dict(
                    aid_id=fid,
                    student_id=stu,
                    aid_type=str(rng.choice(AID_TYPES)),
                    amount=round(float(rng.uniform(100, 50_000)), 2),
                    academic_year=str(rng.choice(["2023-2024", "2024-2025"])),
                    disbursement_date=dd,
                    created_at=datetime(2023, 6, 1),
                )
            )
            fid += 1
    out["financial_aid"] = pd.DataFrame(frows)

    # -- tuition payments ---------------------------------------------
    prows = []
    pid = 1
    for stu in range(1, n_students + 1):
        for _ in range(rng.randint(1, 6)):
            prows.append(
                dict(
                    payment_id=pid,
                    student_id=stu,
                    semester_id=int(rng.randint(1, n_semesters + 1)),
                    amount=round(float(rng.uniform(500, 15_000)), 2),
                    payment_date=date(2023, 1, 1) + timedelta(days=int(rng.randint(0, 700))),
                    payment_method=str(rng.choice(PAY_METHODS)),
                    late_fee=(
                        None if rng.rand() < 0.1
                        else (0.0 if rng.rand() < 0.7 else round(float(rng.uniform(10, 200)), 2))
                    ),
                    created_at=datetime(2023, 2, 1),
                )
            )
            pid += 1
    out["tuition_payments"] = pd.DataFrame(prows)
    return out


def _grade_probs() -> list[float]:
    w = np.array([4, 8, 7, 8, 10, 8, 7, 8, 6, 4, 4, 3, 5, 2, 4, 2], dtype=float)
    return list(w / w.sum())


SPARK_SCHEMAS = {
    "students": (
        "student_id int, first_name string, last_name string, email string, "
        "date_of_birth date, enrollment_date date, graduation_date date, "
        "student_status string, gpa decimal(3,2), major_id int, advisor_id int, "
        "address_id int, created_at timestamp"
    ),
    "courses": (
        "course_id int, course_code string, course_name string, description string, "
        "credits int, department_id int, prerequisite_course_id int, "
        "difficulty_level int, created_at timestamp"
    ),
    "departments": (
        "department_id int, department_name string, department_code string, "
        "head_faculty_id int, budget decimal(12,2), building_location string, "
        "created_at timestamp"
    ),
    "faculty": (
        "faculty_id int, first_name string, last_name string, email string, "
        "department_id int, position string, salary decimal(10,2), hire_date date, "
        "office_number string, research_interests array<string>, created_at timestamp"
    ),
    "enrollments": (
        "enrollment_id int, student_id int, course_id int, semester_id int, "
        "enrollment_date date, completion_date date, grade string, "
        "grade_points decimal(3,2), attendance_percentage decimal(5,2), "
        "created_at timestamp"
    ),
    "semesters": (
        "semester_id int, semester_name string, academic_year string, "
        "start_date date, end_date date, is_current boolean, created_at timestamp"
    ),
    "class_sessions": (
        "session_id int, course_id int, faculty_id int, semester_id int, "
        "session_time string, session_date date, room_id int, "
        "attendance_count int, created_at timestamp"
    ),
    "assignments": (
        "assignment_id int, course_id int, semester_id int, assignment_name string, "
        "assignment_type string, due_date date, max_points decimal(6,2), "
        "weight_percentage decimal(5,2), created_at timestamp"
    ),
    "assignment_submissions": (
        "submission_id int, assignment_id int, student_id int, "
        "submission_date timestamp, score decimal(6,2), late_submission boolean, "
        "feedback string, created_at timestamp"
    ),
    "financial_aid": (
        "aid_id int, student_id int, aid_type string, amount decimal(10,2), "
        "academic_year string, disbursement_date date, created_at timestamp"
    ),
    "tuition_payments": (
        "payment_id int, student_id int, semester_id int, amount decimal(10,2), "
        "payment_date date, payment_method string, late_fee decimal(8,2), "
        "created_at timestamp"
    ),
}


def _typed_columns(schema: str) -> tuple[set[str], dict[str, int]]:
    """(int columns, decimal columns → scale) parsed from a DDL string."""
    ints: set[str] = set()
    decs: dict[str, int] = {}
    for field in schema.split(", "):
        name, typ = field.rsplit(" ", 1)
        if typ in ("int", "bigint", "long"):
            ints.add(name.strip())
        elif typ.startswith("decimal("):
            decs[name.strip()] = int(typ[len("decimal("):-1].split(",")[1])
    return ints, decs


def to_spark(spark: SparkSession, pdfs: dict[str, pd.DataFrame]) -> dict[str, DataFrame]:
    from decimal import Decimal

    out = {}
    for name, pdf in pdfs.items():
        schema = SPARK_SCHEMAS[name]
        pdf = pdf.copy()
        ints, decs = _typed_columns(schema)
        # pandas upcasts nullable int columns to float64 — coerce back;
        # DecimalType fields need decimal.Decimal objects
        for c in ints & set(pdf.columns):
            if pdf[c].dtype == "float64":
                pdf[c] = pd.array(
                    [None if pd.isna(v) else int(v) for v in pdf[c]], dtype=object
                )
        for c, scale in decs.items():
            q = Decimal(1).scaleb(-scale)
            pdf[c] = pd.array(
                [
                    None if pd.isna(v) else Decimal(str(v)).quantize(q)
                    for v in pdf[c]
                ],
                dtype=object,
            )
        out[name] = spark.createDataFrame(pdf, schema=schema)
    return out
